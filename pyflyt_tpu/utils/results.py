"""Offline RL-vs-PID comparison plots.

Compact port of /root/reference/examples/evaluation/results.py: loads episode
CSVs written by the hovering logger (one per controller — e.g. RL policy,
cascaded PID expert, gain-scheduled ga_pid) and renders overlaid trajectory /
error / actuation dashboards for side-by-side comparison.

Usage::

    from pyflyt_tpu.utils.results import compare_runs
    compare_runs(
        {"RL": "runs/rl/evaluation_results_0.csv",
         "PID": "runs/pid/evaluation_results_0.csv"},
        "comparison.png",
    )
"""

from __future__ import annotations

import csv


def load_run(path: str) -> dict[str, list[float]]:
    """Loads a hovering-logger CSV into {column: values}."""
    with open(path) as f:
        rows = list(csv.reader(f))
    header, data = rows[0], rows[1:]
    return {
        name: [float(r[i]) for r in data] for i, name in enumerate(header)
    }


def compare_runs(runs: dict[str, str], out_png: str) -> None:
    """Overlaid comparison dashboard (results.py:12-616, condensed)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data = {label: load_run(path) for label, path in runs.items()}

    panels = [
        ("x (m)", "target_x (m)"),
        ("y (m)", "target_y (m)"),
        ("z (m)", "target_z (m)"),
        ("psi (deg)", "target_psi (deg)"),
        ("error_x (m)", None),
        ("error_y (m)", None),
        ("error_z (m)", None),
        ("error_psi (deg)", None),
        ("reward", None),
    ]
    fig, axes = plt.subplots(3, 3, figsize=(16, 10))
    for ax, (col, target_col) in zip(axes.flat, panels):
        for label, d in data.items():
            ax.plot(d["timestep"], d[col], label=label)
        if target_col is not None:
            first = next(iter(data.values()))
            ax.plot(
                first["timestep"], first[target_col], "k--", label="target"
            )
        ax.set_title(col)
        ax.grid(True)
        ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(out_png, dpi=90)
    plt.close(fig)


def summarize(runs: dict[str, str]) -> dict[str, dict[str, float]]:
    """Steady-state error summary per run (the reference's error bars)."""
    import numpy as np

    out = {}
    for label, path in runs.items():
        d = load_run(path)
        half = len(d["timestep"]) // 2
        out[label] = {
            "rmse_pos": float(
                np.sqrt(
                    np.mean(
                        np.asarray(d["error_x (m)"][half:]) ** 2
                        + np.asarray(d["error_y (m)"][half:]) ** 2
                        + np.asarray(d["error_z (m)"][half:]) ** 2
                    )
                )
            ),
            "rmse_psi_deg": float(
                np.sqrt(np.mean(np.asarray(d["error_psi (deg)"][half:]) ** 2))
            ),
            "total_reward": float(np.sum(d["reward"])),
        }
    return out
