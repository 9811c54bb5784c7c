"""Analytics: key-frame search, sequence repair, insertion state machine.

Each vectorized implementation is checked against a literal loop oracle written
from the reference contract (SURVEY.md §3.5), on randomized sequences.
"""

import numpy as np
import pytest

from yolo_puncture_tpu.analytics.keyframe import find_insert_start, fix_class_prob
from yolo_puncture_tpu.analytics.speed import (
    insertion_state_machine,
    insertion_state_machine_jax,
)
from yolo_puncture_tpu.analytics.stats import (
    calculate_speed_mm,
    compute_metrics,
    compute_pixel_to_mm_ratio,
    remove_outliers,
)

rng = np.random.default_rng(42)


# -- oracles (straight transcription of the contract, O(N·wnd²)) --------------

def oracle_find_insert_start(class_list, prob_list, judge_wnd):
    required_count = 0.9 * judge_wnd
    thresholds = [0.9, 0.8, 0.7, 0.6]
    insert = -1
    for i in range(len(prob_list) - judge_wnd + 1):
        wnd_probs = prob_list[i : i + judge_wnd]
        wnd_classes = class_list[i : i + judge_wnd]
        count = sum(1 for j in range(judge_wnd) if wnd_classes[j] == 1)
        if count >= required_count:
            for threshold in thresholds:
                for k in range(judge_wnd - 4):
                    if all(
                        wnd_classes[k + l] == 1 and wnd_probs[k + l] > threshold
                        for l in range(5)
                    ):
                        insert = i + k
                        break
                if insert != -1:
                    break
            if insert != -1:
                break
    return 0 if insert == -1 else insert


def oracle_fix(class_list, prob_list, class_index):
    class_list = list(class_list)
    prob_list = list(prob_list)
    n = len(class_list)
    for i in range(class_index - 1, -1, -1):
        if class_list[i] != 0:
            found = 0.6
            for j in range(i - 1, -1, -1):
                if class_list[j] == 0:
                    found = prob_list[j]
                    break
            class_list[i] = 0
            prob_list[i] = found
    for i in range(class_index + 1, n):
        if class_list[i] != 1:
            found = 0.6
            for j in range(i + 1, n):
                if class_list[j] == 1:
                    found = prob_list[j]
                    break
            class_list[i] = 1
            prob_list[i] = found
    return class_list, prob_list


@pytest.mark.parametrize("trial", range(30))
def test_find_insert_start_matches_oracle(trial):
    rng = np.random.default_rng(1000 + trial)  # per-trial: reproducible alone
    n = int(rng.integers(5, 120))
    wnd = int(rng.integers(10, 41))
    classes = rng.integers(0, 2, size=n).tolist()
    probs = np.round(rng.uniform(0.3, 1.0, size=n), 3).tolist()
    assert find_insert_start(classes, probs, wnd) == oracle_find_insert_start(
        classes, probs, wnd
    )


def test_find_insert_start_clean_transition():
    classes = [0] * 50 + [1] * 50
    probs = [0.95] * 100
    assert find_insert_start(classes, probs, 20) == 50


@pytest.mark.parametrize("trial", range(30))
def test_fix_class_prob_matches_oracle(trial):
    rng = np.random.default_rng(2000 + trial)  # per-trial: reproducible alone
    n = int(rng.integers(1, 60))
    idx = int(rng.integers(0, n))
    classes = rng.integers(0, 2, size=n).tolist()
    probs = np.round(rng.uniform(0, 1, size=n), 3).tolist()
    got_c, got_p = fix_class_prob(classes, probs, idx)
    exp_c, exp_p = oracle_fix(classes, probs, idx)
    assert got_c == exp_c
    np.testing.assert_allclose(got_p, exp_p)


# -- state machine ------------------------------------------------------------

def _scenario(n=120, start=60, fps=30.0, drop_rate=0.02):
    """Synthetic puncture: constant pre-insert length, shrink after start."""
    lens = np.concatenate(
        [np.full(start, 100.0) + rng.normal(0, 0.5, start),
         100.0 - np.linspace(0, 40, n - start) + rng.normal(0, 0.5, n - start)]
    )
    classes = np.concatenate([np.zeros(start, int), np.ones(n - start, int)])
    detected = rng.uniform(size=n) > drop_rate
    return classes.tolist(), lens.tolist(), detected.tolist(), start, fps


def test_state_machine_basic_speed():
    classes, lens, detected, start, fps = _scenario()
    res = insertion_state_machine(classes, lens, detected, start, fps)
    # the scenario shrinks ~0.678 px/frame from a ~100 px calibration (20 mm),
    # so the 2 mm (≈10 px) threshold lands ~15 frames after start — pin the
    # DETECTED interval, not just the speed formula (which the implementation
    # guarantees by construction)
    assert res.end_frame is not None
    assert start + 12 <= res.end_frame <= start + 19, res.end_frame
    assert res.speed_mm_s == pytest.approx(
        2.0 / ((res.end_frame - start) / fps), rel=1e-6
    )


@pytest.mark.parametrize("trial", range(10))
def test_state_machine_jax_matches_host(trial):
    rng = np.random.default_rng(3000 + trial)  # per-trial: reproducible alone
    n = int(rng.integers(30, 150))
    start = int(rng.integers(0, n))
    classes = rng.integers(0, 2, size=n).tolist()
    lens = rng.uniform(50, 120, size=n).tolist()
    detected = (rng.uniform(size=n) > 0.1).tolist()
    host = insertion_state_machine(classes, lens, detected, start, 30.0)
    s, e, v, actual = insertion_state_machine_jax(classes, lens, detected, start, 30.0)
    e, v = int(e), float(v)
    if host.end_frame is None:
        assert e == -1
    else:
        assert e == host.end_frame
        assert v == pytest.approx(host.speed_mm_s, rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(actual), host.actual_lens, rtol=1e-5, atol=1e-4, equal_nan=True
    )


# -- stats --------------------------------------------------------------------

def test_remove_outliers_mad():
    data = [10.0, 10.1, 9.9, 10.0, 50.0]
    out = remove_outliers(data)
    assert 50.0 not in out and len(out) == 4
    # zero MAD → unchanged
    assert remove_outliers([5.0, 5.0, 5.0]) == [5.0, 5.0, 5.0]


def test_pixel_to_mm_ratio():
    lens = [0.0] * 10 + [100.0] * 5 + [90.0]
    r = compute_pixel_to_mm_ratio(lens, 15)
    assert r == pytest.approx(20.0 / 100.0)
    with pytest.raises(ValueError):
        compute_pixel_to_mm_ratio(lens, 0)


def test_calculate_speed_mm_matches_oracle():
    lens = rng.uniform(10, 20, size=40).tolist()
    start, end, fps = 10, 20, 30.0
    got = calculate_speed_mm(lens, start, end, fps)
    exp = []
    for i in range(max(0, start - 5), min(len(lens) - 1, end + 5)):
        for j in range(i + 1, min(len(lens), end + 5)):
            t = (j - i) / fps
            if t > 0:
                exp.append((lens[i] - lens[j]) / t)
    np.testing.assert_allclose(got, exp)


def test_compute_metrics_perfect_prediction():
    # linear shrink from frame 50; ground truth start=50
    lens = [100.0] * 50 + list(100 - 2.0 * np.arange(50))
    # raw: first len ≤ 90 at idx 55 (len=90) → speed 12 vs actual 10 → dev 0.2
    dev_raw, dev_g, dev_sg = compute_metrics(lens, (50, 56), (50, 56), fps=30)
    assert dev_raw == pytest.approx(0.2, abs=1e-9)
    assert dev_g < 0.5 and dev_sg < 0.5
