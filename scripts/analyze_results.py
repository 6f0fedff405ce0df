"""Build RESULTS.md tables/curves from run transitions logs.

Reads the reference-format transitions logs (reward-value, grasping_type,
episode_success, clearance, training_loss, is-exploit) of one or more run
directories and emits per-run summaries: overall and per-primitive success
rates, episode clearance stats, and a coarse learning curve (success rate
per iteration decile) — the quantities the reference's paper plots are
computed from (reference main.py:123-126, 296-297, 421-422).

Usage:
    python scripts/analyze_results.py logs/<run>[ logs/<run2> ...] \
        [--out RESULTS.md] [--label name1,name2,...]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

ACTION_NAMES = {0: "grasp", 1: "suction", 2: "ets"}


def _load(run_dir: str, name: str) -> np.ndarray:
    path = os.path.join(run_dir, "transitions", f"{name}.log.txt")
    if not os.path.exists(path):
        return np.zeros((0,))
    arr = np.loadtxt(path, delimiter=" ", ndmin=2)
    return arr if arr.size else np.zeros((0,))


def summarize(run_dir: str) -> dict:
    reward = _load(run_dir, "reward-value")        # (K, 1) prev-step reward
    gtype = _load(run_dir, "grasping_type")        # (K, 1) executed action
    episode = _load(run_dir, "episode_success")    # (E, 3) ep, iter, succ
    loss = _load(run_dir, "training_loss")         # (I, 2) iter, loss
    exploit = _load(run_dir, "is-exploit")         # (K, 1)

    out = {"run": run_dir, "transitions": int(reward.shape[0])}
    if reward.size and gtype.size:
        # Row i's reward is the (i - B)-th action's outcome (delayed
        # labeling); for rate aggregation pair them positionally — the
        # first batch of zero rewards biases all rates identically.
        n = min(reward.shape[0], gtype.shape[0])
        r = reward[:n, 0]
        a = gtype[:n, 0].astype(int)
        succ = r > 0
        out["success_rate"] = float(succ.mean())
        for aid, name in ACTION_NAMES.items():
            m = a == aid
            out[f"{name}_share"] = float(m.mean())
            out[f"{name}_success"] = (
                float(succ[m].mean()) if m.any() else float("nan")
            )
        # ETS full-success (reward 2.5) vs partial (0.5).
        ets = a == 2
        if ets.any():
            out["ets_full_rate"] = float((r[ets] >= 2.5).mean())
        # Learning curve: success rate per decile of the run.
        edges = np.linspace(0, n, 11).astype(int)
        out["curve"] = [
            round(float(succ[s:e].mean()), 3) if e > s else float("nan")
            for s, e in zip(edges[:-1], edges[1:])
        ]
    if exploit.size:
        out["exploit_share"] = float(exploit[:, 0].mean())
    if episode.size:
        out["episodes"] = int(episode.shape[0])
        out["mean_episode_len"] = float(episode[:, 1].mean())
        out["mean_episode_succ"] = float(episode[:, 2].mean())
    if loss.size:
        k = max(1, loss.shape[0] // 10)
        out["final_loss"] = float(loss[-k:, 1].mean())
    return out


def to_markdown(summaries: list[dict], labels: list[str]) -> str:
    lines = [
        "# RESULTS",
        "",
        "Success-rate tables computed from the runs' transitions logs by",
        "`scripts/analyze_results.py` (the quantities the reference paper's",
        "plots are computed from; reference main.py:123-126, 421-422).",
        "",
        "| run | transitions | episodes | success | grasp | suction | ets "
        "| ets-full | mean ep len | mean ep succ | final loss |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]

    def fmt(v, pct=False):
        if v is None or (isinstance(v, float) and np.isnan(v)):
            return "-"
        return f"{100 * v:.1f}%" if pct else f"{v:.3f}"

    for s, label in zip(summaries, labels):
        lines.append(
            f"| {label} | {s.get('transitions', 0)} "
            f"| {s.get('episodes', '-')} "
            f"| {fmt(s.get('success_rate'), True)} "
            f"| {fmt(s.get('grasp_success'), True)} "
            f"| {fmt(s.get('suction_success'), True)} "
            f"| {fmt(s.get('ets_success'), True)} "
            f"| {fmt(s.get('ets_full_rate'), True)} "
            f"| {fmt(s.get('mean_episode_len'))} "
            f"| {fmt(s.get('mean_episode_succ'))} "
            f"| {fmt(s.get('final_loss'))} |"
        )
    lines += ["", "## Learning curves (success rate per run decile)", ""]
    for s, label in zip(summaries, labels):
        curve = s.get("curve")
        if curve:
            lines.append(f"- **{label}**: {curve}")
    lines.append("")
    return "\n".join(lines)


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("runs", nargs="+")
    p.add_argument("--out", default="")
    p.add_argument("--labels", default="")
    args = p.parse_args(argv)
    labels = (
        args.labels.split(",") if args.labels
        else [os.path.basename(os.path.normpath(r)) for r in args.runs]
    )
    summaries = [summarize(r) for r in args.runs]
    md = to_markdown(summaries, labels)
    if args.out:
        with open(args.out, "w") as f:
            f.write(md)
        print(f"wrote {args.out}")
    else:
        print(md)


if __name__ == "__main__":
    main()
