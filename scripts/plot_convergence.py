"""Render committed convergence curves from examples/convergence/*/metrics.csv.

Chart style follows the dataviz method: line form for change-over-time, the
validated reference categorical palette (slots 1-2: blue #2a78d6, orange
#eb6834 — the documented adjacent-pair-safe order), 2px lines, recessive
grid, direct labels at line ends plus a legend, text in ink colors rather
than series colors, light surface.
"""

import csv
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK_2 = "#52514e"
GRID = "#e4e3df"
SERIES = ("#2a78d6", "#eb6834")  # palette slots 1, 2

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "examples", "convergence")


def _epoch_rows(path):
    """Epoch-end rows (those carrying the epoch aggregate columns)."""
    with open(path) as f:
        rows = list(csv.DictReader(f))
    out = {}
    for r in rows:
        for key, value in r.items():
            if value in (None, ""):
                continue
            if key in ("epoch", "step"):
                continue
            out.setdefault(key, []).append((int(r["epoch"]), float(value)))
    return out


def _style(ax, title, ylabel):
    ax.set_facecolor(SURFACE)
    ax.set_title(title, color=INK, fontsize=11, loc="left", pad=10)
    ax.set_xlabel("epoch", color=INK_2, fontsize=9)
    ax.set_ylabel(ylabel, color=INK_2, fontsize=9)
    ax.grid(True, color=GRID, linewidth=0.75)
    ax.set_axisbelow(True)
    for spine in ("top", "right"):
        ax.spines[spine].set_visible(False)
    for spine in ("left", "bottom"):
        ax.spines[spine].set_color(GRID)
    ax.tick_params(colors=INK_2, labelsize=8)


def _plot_series(ax, series, names_labels):
    for (name, label), color in zip(names_labels, SERIES):
        if name not in series:
            continue
        pts = sorted(series[name])
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        ax.plot(xs, ys, color=color, linewidth=2, label=label,
                solid_capstyle="round")
    # legend only: both series typically converge to the same end value,
    # so end-of-line direct labels collide (color follows the entity —
    # train is always slot 1, val slot 2, in every panel)
    ax.legend(frameon=False, fontsize=8, labelcolor=INK_2)


def main():
    tasks = sys.argv[1:] or ("ce", "paed_binary")
    for task in tasks:
        path = os.path.join(ROOT, task, "metrics.csv")
        if not os.path.exists(path):
            print(f"skip {task}: no {path}")
            continue
        series = _epoch_rows(path)

        panels = [("loss", [("train_loss", "train loss"),
                            ("valid_loss" if "valid_loss" in series
                             else "val_loss", "val loss")])]
        if "val_IoU" in series:
            panels.append(("IoU", [("train_IoU", "train IoU"),
                                   ("val_IoU", "val IoU")]))
        elif "valid_dataset_iou" in series:
            panels.append(("micro IoU", [("train_dataset_iou", "train IoU"),
                                         ("valid_dataset_iou", "val IoU")]))
        elif "valid_iou" in series:
            panels.append(("soft IoU", [("train_iou", "train IoU"),
                                        ("valid_iou", "val IoU")]))

        fig, axes = plt.subplots(1, len(panels),
                                 figsize=(5.2 * len(panels), 3.4))
        fig.patch.set_facecolor(SURFACE)
        if len(panels) == 1:
            axes = [axes]
        base_task = task.split("_lr")[0]
        if base_task.startswith("smp_"):
            nice = f"{base_task[4:].capitalize()} (smp family)"
        else:
            nice = {"paed_binary": "PAED binary",
                    "paed_multiclass": "PAED multiclass"}.get(
                        base_task, "CE multiclass")
        if task.startswith("paed_binary"):
            nice = "PAED binary"
        config = "P16H512A8"
        summary_path = os.path.join(ROOT, task, "summary.json")
        if os.path.exists(summary_path):
            import json
            with open(summary_path) as f:
                smry = json.load(f)
            config = smry.get("config", config)
            if smry.get("learning_rate"):
                nice += f" · lr {smry['learning_rate']:g}"
        for ax, (ylabel, names) in zip(axes, panels):
            _style(ax, f"{nice} — {config} @224²", ylabel)
            _plot_series(ax, series, names)
        fig.tight_layout()
        out = os.path.join(ROOT, task, "curve.png")
        fig.savefig(out, dpi=144, facecolor=SURFACE)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
