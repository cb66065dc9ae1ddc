"""bench.py must lose gracefully (VERDICT r4 #3): a broken production
vocoder config degrades to the next known-good config with a loud reason —
it must never cost the round its headline number (as the r4 VMEM OOM did)."""

import pytest

from bench import measure_with_fallback


def test_production_failure_falls_back_with_reason():
    calls = []

    def measure(syn):
        calls.append(syn)
        if syn == "prod":
            raise RuntimeError("Mosaic failed: scoped vmem limit exceeded")
        return (123.0, 1.0, 1.0)

    logs = []
    result, name, degraded = measure_with_fallback(
        [("production", lambda: "prod"), ("advance24_fused", lambda: "a24")],
        measure, log=logs.append)
    assert result == (123.0, 1.0, 1.0)
    assert name == "advance24_fused"
    assert "scoped vmem" in degraded and "advance24_fused" in degraded
    assert calls == ["prod", "a24"]
    assert logs and "failed" in logs[0]


def test_success_is_not_degraded():
    result, name, degraded = measure_with_fallback(
        [("production", lambda: "prod")], lambda syn: (1.0, 2.0, 3.0))
    assert name == "production" and degraded is None


def test_transient_unavailable_reraises_for_outer_retry():
    def measure(syn):
        raise RuntimeError("UNAVAILABLE: TPU backend setup/compile error")

    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        measure_with_fallback([("production", lambda: "p"),
                               ("random64_xla", lambda: "x")], measure)


def test_all_candidates_fail_raises_last_error():
    def measure(syn):
        raise ValueError(f"boom {syn}")

    with pytest.raises(ValueError, match="boom b"):
        measure_with_fallback([("a", lambda: "a"), ("b", lambda: "b")],
                              measure, log=lambda m: None)
