"""Relay retry wrapper + per-stage device-IO counters (VERDICT r4 items 6/7).

The retry wrapper guards episode-critical device closures against the two
observed transient relay failures (FAILED_PRECONDITION on a first fetch,
multi-minute first-contact hangs — EPISODE_r04 ledger); the IO counters
decompose stage wall-clock into jit dispatches / eager ops / host fetches.
"""

import numpy as np
import pytest

from activesplat_tpu.utils import relay, tracing


class FakeXlaError(RuntimeError):
    pass


FakeXlaError.__name__ = "XlaRuntimeError"


def test_retry_recovers_from_transient_errors():
    calls = {"n": 0}
    sleeps = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise FakeXlaError("FAILED_PRECONDITION: TPU backend error")
        return 42

    out = relay.with_retry(
        flaky, attempts=3, base_delay_s=0.5, desc="test", _sleep=sleeps.append
    )
    assert out == 42
    assert calls["n"] == 3
    assert sleeps == [0.5, 1.0]  # exponential backoff


def test_retry_propagates_programmatic_errors():
    def broken():
        raise ValueError("shape mismatch")

    with pytest.raises(ValueError):
        relay.with_retry(broken, attempts=3, _sleep=lambda s: None)


def test_retry_exhausts_attempts():
    def always():
        raise FakeXlaError("UNAVAILABLE: socket closed")

    with pytest.raises(FakeXlaError):
        relay.with_retry(always, attempts=2, _sleep=lambda s: None)


def test_is_transient_classification():
    assert relay.is_transient(FakeXlaError("FAILED_PRECONDITION: x"))
    assert relay.is_transient(FakeXlaError("transient TPU backend error"))
    assert not relay.is_transient(FakeXlaError("INVALID_ARGUMENT: bad shape"))
    assert not relay.is_transient(ValueError("FAILED_PRECONDITION"))  # type


def test_io_counters_attribute_to_stage():
    import jax.numpy as jnp

    tracing.install_io_counters()
    tracing.reset_stages()

    counted = tracing.counted_jit(lambda x: x + 1)
    with tracing.stage("test/io"):
        y = counted(jnp.ones((8,), jnp.float32))
        z = jnp.asarray([1.0, 2.0]) * 2.0  # eager dispatches
        tracing.fetch(z)  # one 8-byte fetch (2 f32)
        float(tracing.fetch(y)[0])

    io = tracing.stage_report_io()["test/io"]
    assert io["jit"] == 1
    assert io["eager"] >= 1
    assert io["fetch"] == 2
    assert io["fetch_bytes"] == 2 * 4 + 8 * 4
    # stage wall-clock report still works and the stack unwound
    rep = tracing.stage_report_full()
    assert "test/io" in rep
    assert tracing._cur_stage() is None
    tracing.reset_stages()


def test_io_counters_nested_stage_attribution():
    import jax.numpy as jnp

    tracing.install_io_counters()
    tracing.reset_stages()
    with tracing.stage("outer"):
        with tracing.stage("inner"):
            tracing.fetch(jnp.zeros((4,), jnp.float32))
    io = tracing.stage_report_io()
    assert io["inner"]["fetch"] == 1
    assert "outer" not in io or io["outer"]["fetch"] == 0
    tracing.reset_stages()


def test_counted_jit_passes_through_attributes():
    import jax

    fn = jax.jit(lambda x: x * 2)
    counted = tracing.counted_jit(fn)
    assert hasattr(counted, "lower")  # jit API passes through the shim
