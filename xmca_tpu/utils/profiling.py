"""Tracing/profiling hooks (SURVEY.md section 5: absent in the reference).

The reference's only observability is tqdm progress bars; on TPU the
interesting signal is the XLA execution timeline.  ``trace`` wraps
``jax.profiler`` so any analysis block can be captured for TensorBoard /
Perfetto, and ``annotate`` names host-side phases inside a capture.

Usage::

    from xmca_tpu.utils.profiling import trace, annotate

    with trace('/tmp/xmca_trace'):
        model.solve(complexify=True)
        with annotate('rule N'):
            model.rule_n(1000)
"""
import contextlib


@contextlib.contextmanager
def trace(log_dir, create_perfetto_link=False):
    """Capture a jax.profiler trace of the enclosed block."""
    import jax
    jax.profiler.start_trace(
        log_dir, create_perfetto_link=create_perfetto_link
    )
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named sub-span inside a trace (``jax.profiler.TraceAnnotation``)."""
    import jax
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats():
    """Per-device memory statistics, when the backend exposes them."""
    import jax
    stats = {}
    for dev in jax.devices():
        try:
            stats[str(dev)] = dev.memory_stats()
        except Exception:
            stats[str(dev)] = None
    return stats
