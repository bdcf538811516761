"""Tracing / profiling subsystem.

The reference has no active profiling — commented torch.profiler scaffolding
(editor.py:247-249) and tqdm progress only.  TPU-native equivalents:
  * `trace(logdir)` — context manager around jax.profiler.trace for
    perfetto/tensorboard traces of the compiled steps;
  * `PhaseTimer` — blocking per-phase wall-clock accounting (the structured
    version of EditResult.timings);
  * `annotate(name)` — TraceAnnotation wrapper so device ops group under
    named spans in the trace viewer.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context; view with tensorboard or perfetto."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span for device ops (shows up in profiler traces)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class PhaseTimer:
    """Accumulating named phase timer with block-until-ready semantics."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        import jax

        t0 = time.time()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.time() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": round(v, 4), "count": self.counts[k],
                "mean_s": round(v / max(self.counts[k], 1), 4)}
            for k, v in sorted(self.totals.items(), key=lambda kv: -kv[1])
        }

    def dump(self, path: Optional[str] = None) -> str:
        s = json.dumps(self.summary(), indent=1)
        if path:
            with open(path, "w") as f:
                f.write(s)
        return s
