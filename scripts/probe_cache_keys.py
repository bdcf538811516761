"""Diagnose persistent-compile-cache key mismatches (VERDICT r4 weak #3).

Builds the exact bench.py session, then runs the precompile task set with
`compilation_cache.get_cache_key` patched to RECORD each program's key and
abort before any XLA compile happens.  Output: one line per program with its
computed key and whether `<cache_dir>/<name>-<key>-cache` exists on disk.

Run twice (two processes) to check cross-process key determinism:
    python scripts/probe_cache_keys.py > /tmp/keys1.txt
    python scripts/probe_cache_keys.py > /tmp/keys2.txt
    diff /tmp/keys1.txt /tmp/keys2.txt

History: this probe found the round-3/round-4 empty-BENCH mechanism.  With
the old thread-pool precompile (tracing in workers), the optimize program's
StableHLO — and therefore its cache key — differed between a 1-worker run
(3ffad847...), an 8-worker run (37807c5f...), and the round-4 rehearsal's
8-worker run (db3b505e...), while the other nine programs' keys were
stable.  The driver's runs rolled different keys again (there, cfg/invert
re-keyed while optimize matched), so its "warm" cache missed on 6/10
programs and the ~1680 s-per-program cold compiles ate the whole budget.
A second mechanism surfaced after single-threaded lowering landed: a
backend compile running CONCURRENTLY with a lowering perturbs the Pallas
kernel payloads (tpu_custom_call backend_config bytes) embedded in the
module being lowered, so the optimize key still changed between bench runs
(each run minted a fresh persistent-cache entry).  Precompile therefore
lowers EVERYTHING sequentially with no compile in flight, then compiles
concurrently (editor.py `_lower_and_compile`), which pins every process to
a canonical module and key for each program.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    t0 = time.time()
    import jax

    cache_dir = "/root/repo/.jax_cache"
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    import jax.numpy as jnp

    from geodiffuser_tpu.config import EditConfig, ModelConfig
    from geodiffuser_tpu.core.editor import EditSession
    from geodiffuser_tpu.core.pipeline import Pipeline

    mcfg = ModelConfig(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16, remat=False)
    ecfg = EditConfig(num_ddim_steps=50, edit_type="geometry_editor",
                      cache_inversion=False)
    pipe = Pipeline.create(mcfg, image_size=512)
    sess = EditSession(pipe, ecfg)
    print(f"# session ready at {time.time() - t0:.1f}s", file=sys.stderr, flush=True)

    # --- patch: record keys, abort compiles
    from jax._src import compilation_cache as cc

    recorded = []

    class AbortProbe(Exception):
        pass

    real_get_cache_key = cc.get_cache_key

    def probe_get_cache_key(computation, devices, options, backend, *a, **kw):
        key = real_get_cache_key(computation, devices, options, backend, *a, **kw)
        from jax._src.lib.mlir import ir

        name = ir.StringAttr(computation.operation.attributes["sym_name"]).value
        recorded.append((name, key))
        big = ("_impl", "_lambda", "_bundle", "warp_mats")
        if any(s in name for s in big):
            raise AbortProbe(name)
        return key

    cc.get_cache_key = probe_get_cache_key
    try:
        timers = sess.precompile(uncond_prompt=False, max_workers=1)
    finally:
        cc.get_cache_key = real_get_cache_key
    print(f"# precompile probe done at {time.time() - t0:.1f}s "
          f"(timers={timers})", file=sys.stderr, flush=True)

    on_disk = set(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else set()
    for name, key in recorded:
        fname = f"{key}-cache"
        status = "HIT " if fname in on_disk else "MISS"
        print(f"{status} {name:28s} {key}")
    # unmatched disk entries for context
    matched = {f"{k}-cache" for _, k in recorded}
    for f in sorted(on_disk - matched):
        print(f"DISK-ONLY {f}")


if __name__ == "__main__":
    main()
