"""Tracing and throughput metrics.

The reference has no tracing beyond wall-clock prints (SURVEY.md §5); this
adds the two tools a TPU deployment actually needs:

  * :func:`trace` — context manager around ``jax.profiler`` producing a
    TensorBoard-loadable trace directory (the TPU analogue of the
    reference's `-lineinfo`+nsight flow, cuda_ext.py:61).
  * :class:`PhaseTimer` — prompt/decode split throughput counters with the
    reference's metric definitions (README.md:154-156): "prompt" t/s over
    the prefill pass, "best"/"worst" decode t/s at empty/full context.

Timing on a tunneled TPU requires a host fetch to fence (device
block_until_ready can return early through axon); ``fence`` does that.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import numpy as np


def fence(x) -> None:
    """Reliable device fence: fetch one value to the host.

    ``jax.block_until_ready`` is NOT sufficient through remote-device
    transports; fetching data is.
    """
    import jax

    leaves = jax.tree.leaves(x)
    if leaves:
        np.asarray(leaves[0]).ravel()[:1]


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace("/tmp/jax-trace"): ...`` → TensorBoard trace."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class PhaseTimer:
    """Accumulates per-phase token counts and wall time.

    Usage::

        pt = PhaseTimer()
        with pt.phase("prompt", tokens=prompt_len):
            model.forward(ids, cache, preprocess_only=True)
        with pt.phase("decode", tokens=1):
            tok = generator.gen_single_token()
        print(pt.report())
    """

    totals: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str, tokens: int, result=None):
        t0 = time.perf_counter()
        yield
        if result is not None:
            fence(result)
        dt = time.perf_counter() - t0
        tok, sec = self.totals.get(name, (0, 0.0))
        self.totals[name] = (tok + tokens, sec + dt)

    def tok_per_s(self, name: str) -> float:
        tok, sec = self.totals.get(name, (0, 0.0))
        return tok / sec if sec > 0 else 0.0

    def report(self) -> str:
        parts = []
        for name, (tok, sec) in self.totals.items():
            rate = tok / sec if sec > 0 else 0.0
            parts.append(f"{name}: {tok} tokens, {sec:.2f}s, {rate:.1f} t/s")
        return " | ".join(parts)
