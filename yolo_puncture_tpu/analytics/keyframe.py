"""Key-frame (insertion-start) detection and class-sequence repair.

Exact behavioral port targets (bit-equal on any input):
  * ``find_insert_start`` — sliding-window voting of
    yolo_seg/tasks/needle_clasify.py:166-194: first window with ≥ 0.9·wnd class-1
    frames; inside it the highest threshold from [0.9, 0.8, 0.7, 0.6] with a run of
    5 consecutive class-1 frames above it; earliest such run; fallback 0.
  * ``fix_class_prob`` — monotonicity repair of needle_clasify.py:100-129: all 0
    before the key frame, all 1 after; probabilities backfilled from the nearest
    same-class neighbor in the ORIGINAL sequence, else 0.6.

Vectorized with numpy sliding windows (the reference is O(N·wnd·4·wnd) Python
loops); the host cost for a 1 000-frame video is microseconds.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

THRESHOLDS = (0.9, 0.8, 0.7, 0.6)


def find_insert_start(
    class_list: Sequence[int],
    prob_list: Sequence[float],
    judge_wnd: int = 20,
) -> int:
    classes = np.asarray(class_list)
    probs = np.asarray(prob_list, dtype=np.float64)
    n = len(classes)
    if n < judge_wnd:
        return 0
    required = 0.9 * judge_wnd
    ones = classes == 1

    # window class-1 counts for every start i
    csum = np.concatenate([[0], np.cumsum(ones)])
    counts = csum[judge_wnd:] - csum[: n - judge_wnd + 1]  # (n - wnd + 1,)
    passing = np.flatnonzero(counts >= required)
    if passing.size == 0:
        return 0

    # run5[t, p] for threshold t: positions p (0..n-5) starting 5 consecutive
    # class-1 frames with prob > thr
    run5 = []
    for thr in THRESHOLDS:
        good = ones & (probs > thr)
        if n < 5:
            run5.append(np.zeros(0, dtype=bool))
            continue
        w = np.lib.stride_tricks.sliding_window_view(good, 5)
        run5.append(w.all(axis=1))  # (n - 4,)

    k_max = judge_wnd - 4  # k ranges over [0, judge_wnd-5] inclusive → k_max slots
    for i in passing:
        for t in range(len(THRESHOLDS)):
            r = run5[t]
            lo, hi = i, min(i + k_max, len(r))
            if lo >= hi:
                continue
            hits = np.flatnonzero(r[lo:hi])
            if hits.size:
                return int(i + hits[0])
    return 0


def fix_class_prob(
    class_list: Sequence[int], prob_list: Sequence[float], class_index: int
) -> Tuple[List[int], List[float]]:
    classes = np.asarray(class_list).copy()
    probs = np.asarray(prob_list, dtype=np.float64).copy()
    n = len(classes)
    orig_classes = classes.copy()
    orig_probs = probs.copy()

    # before key frame: force 0, prob from nearest earlier original 0, else 0.6
    before = np.arange(class_index)
    wrong_before = before[orig_classes[before] != 0]
    if wrong_before.size:
        zero_pos = np.flatnonzero(orig_classes[:class_index] == 0)
        for i in wrong_before:
            earlier = zero_pos[zero_pos < i]
            probs[i] = orig_probs[earlier[-1]] if earlier.size else 0.6
            classes[i] = 0

    # after key frame: force 1, prob from nearest later original 1, else 0.6
    after = np.arange(class_index + 1, n)
    wrong_after = after[orig_classes[after] != 1]
    if wrong_after.size:
        one_pos = np.flatnonzero(orig_classes == 1)
        for i in wrong_after:
            later = one_pos[one_pos > i]
            probs[i] = orig_probs[later[0]] if later.size else 0.6
            classes[i] = 1

    return classes.tolist(), probs.tolist()


def predict_and_find_start_inserted_from_scores(
    class_list: Sequence[int],
    prob_list: Sequence[float],
    judge_wnd: int = 20,
) -> Tuple[List[int], List[float], int]:
    """Key-frame search + repair given classifier outputs (the tail of
    needle_clasify.predict_and_find_start_inserted, decoupled from the model)."""
    idx = find_insert_start(class_list, prob_list, judge_wnd)
    classes, probs = fix_class_prob(list(class_list), list(prob_list), idx)
    return classes, probs, idx
