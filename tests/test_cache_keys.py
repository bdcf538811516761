"""Persistent-compilation-cache key determinism (the round-5 root-cause fix).

The r3/r4 driver BENCH artifacts were empty because program cache keys
differed between processes: thread-pool tracing perturbed the optimize
program's StableHLO, and backend compiles running concurrently with a
lowering perturbed the embedded Pallas kernel payloads.  The fix
(EditSession._lower_and_compile) lowers everything sequentially with no
compile in flight.  This test pins the property: two fresh subprocesses
lowering the session's step programs through the precompile task machinery
must compute IDENTICAL cache keys for every program.
"""

import json
import os
import subprocess
import sys

import pytest

_CHILD = r'''
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
from geodiffuser_tpu.utils import compile_cache

compile_cache.configure("cpu")
import jax.numpy as jnp

from geodiffuser_tpu.config import EditConfig, ModelConfig
from geodiffuser_tpu.core.editor import EditSession
from geodiffuser_tpu.core.pipeline import Pipeline

pipe = Pipeline.create(ModelConfig.tiny(), image_size=128)
sess = EditSession(pipe, EditConfig(num_ddim_steps=4, optimize_steps=0.65,
                                    skip_optim_steps=2, latent_replace=0.3))
tasks = sess._precompile_tasks(include_full_blend=True)

# compute the REAL cache key per lowered program, aborting before the
# (expensive) backend compile — exactly what scripts/probe_cache_keys.py does
from jax._src import compilation_cache as cc

real = cc.get_cache_key
keys = {}


class Abort(Exception):
    pass


def probe(computation, devices, options, backend, *a, **kw):
    key = real(computation, devices, options, backend, *a, **kw)
    raise Abort(key)


cc.get_cache_key = probe
for name, fn, args, kwargs, critical in tasks:
    lowered = fn.lower(*args, **kwargs)
    try:
        lowered.compile()
    except Abort as e:
        keys[name] = str(e.args[0])
    except Exception as e:  # tiny op compiles inside may slip through
        keys[name] = f"ERROR:{type(e).__name__}"
cc.get_cache_key = real
print("KEYS:" + json.dumps(keys))
'''


# full tier: two subprocesses x (tiny Pipeline.create + 16 lowerings) ~ 2 min
def test_cache_keys_identical_across_processes(tmp_path):
    child = tmp_path / "key_child.py"
    child.write_text(_CHILD)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outs = []
    for _ in range(2):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        r = subprocess.run([sys.executable, str(child)], env=env, cwd=repo,
                           capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr[-2000:]
        line = [l for l in r.stdout.splitlines() if l.startswith("KEYS:")][-1]
        outs.append(json.loads(line[5:]))

    a, b = outs
    assert a.keys() == b.keys()
    # every program the session precompiles — including the optimize grad
    # program (the historically nondeterministic one) and the full_blend
    # variants — must key identically in both processes
    mismatches = {k: (a[k][:20], b[k][:20]) for k in a if a[k] != b[k]}
    assert not mismatches, mismatches
    assert any(k.startswith("optimize") for k in a)
    assert not any(v.startswith("ERROR") for v in a.values()), a
