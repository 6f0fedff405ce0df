"""Build RESULTS.md tables/curves from run transitions logs.

Reads the reference-format transitions logs (reward-value, grasping_type,
episode_success, clearance, training_loss, is-exploit) of one or more run
directories and emits per-run summaries: overall and per-primitive success
rates, episode clearance stats, and a coarse learning curve (success rate
per iteration decile) — the quantities the reference's paper plots are
computed from (reference main.py:123-126, 296-297, 421-422).

Alignment: rewards are delayed one step — the reward logged at step t is
the outcome of step t-1's action, for the same scene (train/loop.py:346-350,
matching reference main.py:324-326). With batch size B the logs are
step-major (B rows per step, cli/main.py:log_step_metrics), so reward row i
is the outcome of action row i - B. B is read from the run's
info/config.json (loop.batch_size); the first batch of rewards (blank
previous step) is dropped.

Usage:
    python scripts/analyze_results.py logs/<run>[ logs/<run2> ...] \
        [--out RESULTS.md] [--label name1,name2,...] [--batch B]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

# Action codes: 0 = suction, 1 = grasp, 2 = grasp-then-suction (ETS).
# Parity: reference main.py:368-374; this repo policy/arbitrate.py:22-24.
ACTION_NAMES = {0: "suction", 1: "grasp", 2: "ets"}


def _resolve(run_dir: str) -> str:
    """Descend into the latest timestamped subdir if run_dir is a parent."""
    if os.path.isdir(os.path.join(run_dir, "transitions")):
        return run_dir
    subs = sorted(
        d for d in os.listdir(run_dir)
        if os.path.isdir(os.path.join(run_dir, d, "transitions"))
    )
    return os.path.join(run_dir, subs[-1]) if subs else run_dir


def _load(run_dir: str, name: str) -> np.ndarray:
    path = os.path.join(run_dir, "transitions", f"{name}.log.txt")
    if not os.path.exists(path):
        return np.zeros((0,))
    arr = np.loadtxt(path, delimiter=" ", ndmin=2)
    return arr if arr.size else np.zeros((0,))


def _batch_size(run_dir: str) -> int | None:
    """Scene-batch size B from the run's saved config (rows per step)."""
    path = os.path.join(run_dir, "info", "config.json")
    try:
        with open(path) as f:
            cfg = json.load(f)
        return int(cfg["loop"]["batch_size"])
    except (OSError, KeyError, TypeError, ValueError):
        return None


def summarize(run_dir: str, batch: int | None = None) -> dict:
    run_dir = _resolve(run_dir)
    reward = _load(run_dir, "reward-value")        # (K, 1) prev-step reward
    gtype = _load(run_dir, "grasping_type")        # (K, 1) executed action
    episode = _load(run_dir, "episode_success")    # (E, 3) ep, iter, succ
    loss = _load(run_dir, "training_loss")         # (I, 2) iter, loss
    exploit = _load(run_dir, "is-exploit")         # (K, 1)

    B = batch if batch is not None else (_batch_size(run_dir) or 1)
    out = {"run": run_dir, "transitions": int(reward.shape[0]), "batch": B}
    if reward.size and gtype.size:
        n = min(reward.shape[0], gtype.shape[0])
        if n <= B:
            return out
        # Reward row i <- action row i - B (delayed labeling, see module
        # docstring). Drop the first batch of rewards: they pair with the
        # blank pre-run step, not any executed action.
        r = reward[B:n, 0]                         # outcomes of actions 0..n-B
        a = gtype[: n - B, 0].astype(int)          # the actions they score
        a_all = gtype[:n, 0].astype(int)           # for share-of-actions only
        succ = r > 0
        out["success_rate"] = float(succ.mean())
        for aid, name in ACTION_NAMES.items():
            m = a == aid
            out[f"{name}_share"] = float((a_all == aid).mean())
            out[f"{name}_success"] = (
                float(succ[m].mean()) if m.any() else float("nan")
            )
        # ETS full-success (reward 2.5) vs partial (0.5).
        ets = a == 2
        if ets.any():
            out["ets_full_rate"] = float((r[ets] >= 2.5).mean())
        # Learning curve: success rate per decile of the run.
        edges = np.linspace(0, r.shape[0], 11).astype(int)
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
        "Per-action success pairs each delayed reward with the action that",
        "produced it (reward row i <- action row i - batch); `share` columns",
        "are the fraction of all executed actions of that type.",
        "",
        "| run | transitions | episodes | success "
        "| suction succ (share) | grasp succ (share) | ets succ (share) "
        "| ets-full | mean ep len | mean ep succ | final loss |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]

    def fmt(v, pct=False):
        if v is None or (isinstance(v, float) and np.isnan(v)):
            return "-"
        return f"{100 * v:.1f}%" if pct else f"{v:.3f}"

    def succ_share(s, name):
        succ = fmt(s.get(f"{name}_success"), True)
        share = fmt(s.get(f"{name}_share"), True)
        return f"{succ} ({share})"

    for s, label in zip(summaries, labels):
        lines.append(
            f"| {label} | {s.get('transitions', 0)} "
            f"| {s.get('episodes', '-')} "
            f"| {fmt(s.get('success_rate'), True)} "
            f"| {succ_share(s, 'suction')} "
            f"| {succ_share(s, 'grasp')} "
            f"| {succ_share(s, 'ets')} "
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
    p.add_argument(
        "--batch", type=int, default=None,
        help="rows per step (overrides the run's info/config.json)",
    )
    args = p.parse_args(argv)
    labels = (
        args.labels.split(",") if args.labels
        else [os.path.basename(os.path.normpath(r)) for r in args.runs]
    )
    summaries = [summarize(r, args.batch) for r in args.runs]
    md = to_markdown(summaries, labels)
    if args.out:
        with open(args.out, "w") as f:
            f.write(md)
        print(f"wrote {args.out}")
    else:
        print(md)


if __name__ == "__main__":
    main()
