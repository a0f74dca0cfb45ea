"""Multi-host bootstrap and image assembly (rayz_tpu.parallel.multihost).

The reference is single-process (SURVEY.md §2: no threads/processes/network),
so there is nothing to match numerically — these tests pin the BEHAVIOR of the
TPU-native bootstrap: ``initialize()`` must actually call into
``jax.distributed`` in its no-arg auto-detect default (it was a silent no-op
once), must be idempotent when the launcher already initialized the runtime,
and must not swallow errors when an explicit coordinator is given.
"""

import jax
import numpy as np
import pytest

from rayz_tpu.parallel import multihost


class _Recorder:
    def __init__(self, exc=None):
        self.calls = []
        self.exc = exc

    def __call__(self, **kw):
        self.calls.append(kw)
        if self.exc is not None:
            raise self.exc


def test_initialize_autodetect_calls_jax_distributed(monkeypatch):
    rec = _Recorder()
    monkeypatch.setattr(jax.distributed, "initialize", rec)
    multihost.initialize()
    assert rec.calls == [{}]  # no-arg auto-detect path reached JAX


def test_initialize_swallows_no_cluster_error(monkeypatch):
    # Single-process environment: auto-detection finds no cluster and JAX
    # raises ValueError('coordinator_address should be defined.') — the
    # no-arg form proceeds single-process.
    rec = _Recorder(exc=ValueError("coordinator_address should be defined."))
    monkeypatch.setattr(jax.distributed, "initialize", rec)
    multihost.initialize()  # must not raise
    assert rec.calls == [{}]


def test_initialize_explicit_coordinator_forwards_and_raises(monkeypatch):
    rec = _Recorder(exc=ValueError("boom"))
    monkeypatch.setattr(jax.distributed, "initialize", rec)
    with pytest.raises(ValueError):
        multihost.initialize("10.0.0.1:1234", num_processes=2, process_id=0)
    assert rec.calls == [{
        "coordinator_address": "10.0.0.1:1234",
        "num_processes": 2,
        "process_id": 0,
    }]


def test_initialize_idempotent_when_already_up(monkeypatch):
    from jax._src import distributed

    rec = _Recorder()
    monkeypatch.setattr(jax.distributed, "initialize", rec)
    monkeypatch.setattr(distributed.global_state, "client", object())
    multihost.initialize()
    assert rec.calls == []  # launcher already initialized: no re-init


def test_assemble_single_process_roundtrip():
    img = jax.numpy.arange(12.0).reshape(2, 2, 3)
    out = multihost.assemble_global_image(img)
    assert isinstance(out, np.ndarray)
    np.testing.assert_allclose(out, np.asarray(img))


def test_primary_host_and_global_mesh():
    assert multihost.is_primary_host()
    mesh = multihost.global_mesh()
    assert mesh.size == len(jax.devices())
