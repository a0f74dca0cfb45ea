"""Profiling utilities (rayz_tpu.utils.profiling).

The reference's observability is one wall-clock perf line
(/root/reference/src/rayz.zig:24-34); RenderStats reproduces its units and
format, and trace() wraps jax.profiler — the smoke test checks a trace dump is
actually produced (it was untested dead weight once).
"""

import os

import jax
import jax.numpy as jnp

from rayz_tpu.utils.profiling import RenderStats, timed_render, trace


def test_render_stats_units_and_format():
    st = RenderStats(seconds=2.0, rays=4_000_000, image=None)
    assert st.rays_per_s == 2_000_000
    assert abs(st.us_per_ray - 0.5) < 1e-12
    s = st.summary()
    assert "Finished render (2.00s)" in s
    assert "rps" in s and "us per ray" in s


def test_timed_render_counts_camera_rays():
    st = timed_render(lambda: jnp.zeros((4, 4, 3)), width=4, height=4, spp=7,
                      best_of=2)
    assert st.rays == 4 * 4 * 7
    assert st.seconds > 0
    assert st.image.shape == (4, 4, 3)


def test_trace_produces_dump(tmp_path):
    log_dir = str(tmp_path / "trace")
    with trace(log_dir, create_perfetto_trace=False):
        jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    files = [os.path.join(r, f) for r, _, fs in os.walk(log_dir) for f in fs]
    assert files, "jax.profiler produced no trace files"
