"""Round-trip test for scripts/analyze_results.py on synthetic logs.

Builds a fake run directory whose transitions logs encode a KNOWN
generating process — per-action success probabilities with the one-step
delayed reward convention (reward row i is the outcome of action row
i - B) — and asserts the analyzer recovers the exact per-action rates.

This pins the two failure modes the round-2 RESULTS.md shipped with:
swapped action names (0 must be suction, 1 grasp — reference
main.py:368-374) and pairing reward row i with action row i instead of
i - B.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "scripts")
)

import analyze_results as ar


def _write_log(run, name, arr):
    os.makedirs(os.path.join(run, "transitions"), exist_ok=True)
    np.savetxt(
        os.path.join(run, "transitions", f"{name}.log.txt"),
        np.atleast_2d(arr), delimiter=" ",
    )


def _make_run(tmp_path, B=4, steps=50, seed=0):
    """Synthetic run: action a's outcome succeeds with SUCC_P[a]."""
    rng = np.random.default_rng(seed)
    run = str(tmp_path / "run")
    os.makedirs(os.path.join(run, "info"), exist_ok=True)
    with open(os.path.join(run, "info", "config.json"), "w") as f:
        json.dump({"loop": {"batch_size": B}}, f)

    SUCC_P = {0: 0.9, 1: 0.3, 2: 0.6}  # suction easy, grasp hard
    REWARD = {0: 1.0, 1: 1.0, 2: 2.5}
    n = steps * B
    actions = rng.integers(0, 3, size=n)
    # outcome[i] = did action i succeed (iid Bernoulli per action type)
    outcome = rng.random(n) < np.vectorize(SUCC_P.get)(actions)
    reward_of_action = np.where(
        outcome, np.vectorize(REWARD.get)(actions), 0.0
    )
    # Delayed logging: reward row i reports action row i - B; the first
    # batch of rewards is the blank pre-run step (zeros).
    rewards = np.concatenate([np.zeros(B), reward_of_action[:-B]])
    _write_log(run, "grasping_type", actions[:, None].astype(float))
    _write_log(run, "reward-value", rewards[:, None])
    _write_log(run, "is-exploit", np.ones((n, 1)))
    return run, actions, outcome


def test_per_action_rates_recovered(tmp_path):
    run, actions, outcome = _make_run(tmp_path)
    s = ar.summarize(run)
    # Aligned domain: every action except the last batch has a logged
    # outcome (its reward appears B rows later).
    B = 4
    a = actions[:-B]
    o = outcome[:-B]
    assert s["success_rate"] == pytest.approx(o.mean())
    for aid, name in ar.ACTION_NAMES.items():
        m = a == aid
        assert s[f"{name}_success"] == pytest.approx(o[m].mean()), name
        assert s[f"{name}_share"] == pytest.approx((actions == aid).mean())
    # Suction (easy, 0.9) must map to code 0 and grasp (hard, 0.3) to 1:
    # a name swap would invert this ordering.
    assert s["suction_success"] > s["grasp_success"]
    # ETS rewards are always 2.5 on success here, so the full-success rate
    # over all ETS actions equals the ETS success rate.
    assert s["ets_full_rate"] == pytest.approx(o[a == 2].mean())


def test_misalignment_would_be_caught(tmp_path):
    """The correlation structure distinguishes aligned from shifted pairing:
    with per-action success probabilities this different, pairing reward
    row i with action row i (the round-2 bug) yields rates near the global
    mean instead of {0.9, 0.3, 0.6}."""
    run, actions, outcome = _make_run(tmp_path, steps=200, seed=1)
    s = ar.summarize(run)
    assert abs(s["suction_success"] - 0.9) < 0.06
    assert abs(s["grasp_success"] - 0.3) < 0.06
    assert abs(s["ets_success"] - 0.6) < 0.06


def test_batch_fallback_flag(tmp_path):
    run, _, _ = _make_run(tmp_path, B=4)
    os.remove(os.path.join(run, "info", "config.json"))
    # Without config.json the caller-provided stride applies.
    s = ar.summarize(run, batch=4)
    assert s["batch"] == 4
