"""Profiling hooks (utils/profiling): trace capture, annotation, memory
stats — the auxiliary observability subsystem (SURVEY.md section 5)."""
import os

import numpy as np
import jax.numpy as jnp

from xmca_tpu.utils.profiling import trace, annotate, device_memory_stats


def test_trace_writes_capture(tmp_path):
    log_dir = str(tmp_path / 'trace')
    with trace(log_dir):
        with annotate('work'):
            x = jnp.ones((64, 64))
            float(jnp.sum(x @ x))
    # jax.profiler writes a plugins/profile/<ts>/ tree
    found = []
    for root, _dirs, files in os.walk(log_dir):
        found.extend(files)
    assert found, 'trace produced no capture files'


def test_annotate_outside_trace_is_harmless():
    with annotate('no-trace-active'):
        assert float(jnp.sum(jnp.arange(4.0))) == 6.0


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert isinstance(stats, dict) and len(stats) >= 1
    for v in stats.values():
        assert v is None or isinstance(v, dict)
        if isinstance(v, dict):
            assert all(np.isscalar(x) or x is None for x in v.values())
