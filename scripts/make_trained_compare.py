"""Assemble the trained 9-config sweep's eval CSVs into a compareModels
report (reference model/CE/compareModels.py workflow, run on models trained
in THIS framework).

Each `scripts/train_convergence.py` run under examples/convergence/ce_<cfg>/
keeps its reference-schema per-image CSV; this script lays them out the way
the compare CLI expects (<dir>/<model>/<model>_metrics.csv — the layout the
reference's eval sweep writes, datasetTestViTmodel.py:163) and renders the
aggregate bars + per-model class-confusion matrices into
examples/trained_sweep/.

Usage: python scripts/make_trained_compare.py
"""

import glob
import os
import shutil
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONV = os.path.join(REPO, "examples", "convergence")
OUT = os.path.join(REPO, "examples", "trained_sweep")


def main() -> None:
    from visiontransformer_tpu.evaluation.compare import (
        aggregate_metrics,
        plot_confusion_matrices,
        plot_summary,
    )

    stage = tempfile.mkdtemp(prefix="trained_sweep_")
    n = 0
    for csv_path in sorted(glob.glob(os.path.join(CONV, "ce_*", "P*_metrics.csv"))):
        name = os.path.basename(csv_path)[: -len("_metrics.csv")]
        os.makedirs(os.path.join(stage, name), exist_ok=True)
        shutil.copy(csv_path, os.path.join(stage, name, os.path.basename(csv_path)))
        n += 1
    if not n:
        raise SystemExit("no ce_P*/P*_metrics.csv runs found under examples/convergence")

    os.makedirs(OUT, exist_ok=True)
    summary = plot_summary(stage, os.path.join(OUT, "summary.png"))
    plot_confusion_matrices(stage, os.path.join(OUT, "confusion"))
    summary.to_csv(os.path.join(OUT, "summary.csv"))
    print(summary.to_string())
    print(f"report for {n} trained configs -> {OUT}")


if __name__ == "__main__":
    main()
