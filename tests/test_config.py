"""Config helpers: timestamp wiring of --interval/--t_begin/--t_end."""
import pytest

from mocopci_tpu.config import ModelConfig, timestamps


def test_default_timestamps_match_reference_literals():
    # the reference hard-codes these (mocopci.py:824-825); the wired flags must
    # reproduce them bit-for-bit with the default CLI values
    t_f, t_b = timestamps(0.0, 1.0, 4, 4)
    cfg = ModelConfig()
    assert t_f == cfg.t_forward
    assert t_b == cfg.t_backward


def test_custom_time_range():
    t_f, t_b = timestamps(-1.0, 1.0, 4, 4)
    assert t_f[0] == -1.0 and t_f[-1] == 1.0
    assert abs(t_f[2]) < 1e-12  # midpoint
    assert t_b == tuple(reversed(t_f))


def test_invalid_interval_rejected():
    with pytest.raises(ValueError, match="interval"):
        timestamps(0.0, 1.0, 3, 4)
    with pytest.raises(ValueError, match="num_frames"):
        timestamps(0.0, 1.0, 4, 6)
