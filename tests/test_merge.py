"""Weight-merge parity (SURVEY.md §2.3 M8, train.py:202-247)."""

from __future__ import annotations

import numpy as np

from greenocr_ray.functions.merge import (
    merge_states,
    merge_states_dataset,
    states_to_dataset,
)


def _state(seed: int) -> dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    return {
        "cnn.5.weight": rng.random((4, 3)).astype(np.float32),
        "lstm.weight": rng.random(6).astype(np.float32),
        "fc.bias": rng.random(2).astype(np.float32),
    }


def test_merge_states_uniform():
    a, b = _state(1), _state(2)
    m = merge_states([a, b])
    np.testing.assert_allclose(
        m["lstm.weight"], (a["lstm.weight"] + b["lstm.weight"]) / 2, rtol=1e-6
    )


def test_merge_states_restricted_layers():
    # the reference's restricted variant merges lstm/fc/cnn.5 only and
    # keeps everything else from the first state (train.py:219-247)
    a, b = _state(3), _state(4)
    a["head.weight"] = np.ones(3, dtype=np.float32)
    b["head.weight"] = np.zeros(3, dtype=np.float32)
    m = merge_states([a, b], alphas=[0.5, 0.5], layers=["lstm", "fc", "cnn.5"])
    np.testing.assert_array_equal(m["head.weight"], a["head.weight"])
    np.testing.assert_allclose(
        m["fc.bias"], 0.5 * a["fc.bias"] + 0.5 * b["fc.bias"], rtol=1e-6
    )


def test_merge_states_dataset_matches_inmemory(ray_session):
    states = {"bucket0": _state(5), "bucket1": _state(6), "bucket2": _state(7)}
    ds = states_to_dataset(states)
    got = merge_states_dataset(ds)
    want = merge_states(list(states.values()))
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k].astype(np.float64), rtol=1e-6)
