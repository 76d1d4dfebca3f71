"""Headless hyperparameter sweep runner (4 phases).

Rebuild of the reference's sweep_runner.py: ``precompute`` writes fingerprinted
split manifests (10 sweep splits 85/15/0 + 20 outer splits 70/15/15);
``sweep`` grid-searches over the parameter grid with a constant token budget
(batch x seq_len held ~constant, snapped to multiples of 32); ``evaluate``
runs the champion parameters over every outer replicate and exports
per-behavior test P/R/F1; ``train_final`` pools train+val and trains one
deployable model, updating the dataset card from the evaluate CSV.
Determinism comes from seeded split manifests + seeded training.
"""

from __future__ import annotations

import glob
import itertools
import json
import os
import time
from datetime import datetime
from typing import Dict, List, Optional

import pandas as pd
import yaml

from cbas_tpu.core.config import TrainingConfig, load_yaml, dump_yaml
from cbas_tpu.core.project import Project
from cbas_tpu.core.splits import (
    ManifestSplitProvider,
    RandomSplitProvider,
    SplitProvider,
    dataset_fingerprint,
    subject_of,
)
from cbas_tpu.engine.orchestrator import run_training_job
from cbas_tpu.utils.logging import log_message


def nice_multiple(x: int, base: int = 32, minimum: int = 32) -> int:
    return max(minimum, (x // base) * base)


def derive_batch_size_for_seq_len(
    seq_len: int,
    base_batch: int = 1024,
    base_seq: int = 31,
    batch_cap: int = 1024,
    minimum: int = 32,
    snap: int = 32,
) -> int:
    """Hold batch*seq_len ~constant (reference: sweep_runner.py:84-97)."""
    target_tokens = base_batch * base_seq
    raw = max(1, target_tokens // max(1, seq_len))
    return min(nice_multiple(raw, snap, minimum), batch_cap)


DEFAULT_PARAMETER_GRID: Dict[str, list] = {
    "weight_decay": [1e-4, 2e-4],
    "lstm_hidden_size": [128],
    "label_smoothing": [0.1],
    "lstm_layers": [1],
    "learning_rate": [5e-5, 7e-5],
    "sequence_length": [63, 95],
}

DEFAULT_SWEEP_FIXED: Dict[str, object] = {
    "training_method": "oversampling",
    "optimization_target": "weighted avg",
    "epochs": 10,
    "patience": 3,
    "batch_size": 1024,
    "use_test": False,
    "test_split": 0.0,
    "num_runs": 5,
    "num_trials": 2,
}

DEFAULT_CHAMPION: Dict[str, object] = {
    "weight_decay": 1e-4,
    "lstm_hidden_size": 128,
    "label_smoothing": 0.1,
    "lstm_layers": 1,
    "training_method": "oversampling",
    "optimization_target": "weighted avg",
    "learning_rate": 5e-5,
    "epochs": 10,
    "patience": 3,
    "batch_size": 1024,
    "sequence_length": 63,
    "use_test": True,
    "test_split": 0.15,
    "num_runs": 15,
    "num_trials": 2,
}


class SweepRunner:
    def __init__(
        self,
        project: Project,
        dataset_name: str,
        parameter_grid: Optional[dict] = None,
        fixed: Optional[dict] = None,
        champion: Optional[dict] = None,
        n_sweep_splits: int = 10,
        n_outer_splits: int = 20,
        seed: int = 42,
    ):
        self.project = project
        self.dataset_name = dataset_name
        self.dataset = project.datasets[dataset_name]
        self.grid = parameter_grid or DEFAULT_PARAMETER_GRID
        self.fixed = dict(DEFAULT_SWEEP_FIXED, **(fixed or {}))
        self.champion = dict(DEFAULT_CHAMPION, **(champion or {}))
        self.n_sweep_splits = n_sweep_splits
        self.n_outer_splits = n_outer_splits
        self.seed = seed
        self.experiments_dir = os.path.join(self.dataset.path, "experiments")
        os.makedirs(self.experiments_dir, exist_ok=True)

    # -- helpers -------------------------------------------------------------

    def _fingerprint(self) -> str:
        return dataset_fingerprint(self.dataset.labels.get("labels", {}))

    def _all_instances(self):
        return [
            inst
            for b in self.dataset.config.get("behaviors", [])
            for inst in self.dataset.labels.get("labels", {}).get(b, [])
        ]

    def _make_task(self, params: dict) -> TrainingConfig:
        return TrainingConfig(
            name=self.dataset_name,
            behaviors=self.dataset.config.get("behaviors", []),
            **params,
        )

    @property
    def sweep_manifest_path(self) -> str:
        return os.path.join(self.project.path, "sweep_splits.json")

    @property
    def outer_manifest_path(self) -> str:
        return os.path.join(self.project.path, "outer_splits.json")

    # -- phase 1: precompute ---------------------------------------------------

    def precompute_splits(self) -> None:
        fingerprint = self._fingerprint()
        log_message(f"Dataset fingerprint: {fingerprint}")
        instances = self._all_instances()
        subjects = list({subject_of(i) for i in instances})
        behaviors = self.dataset.config.get("behaviors", [])

        for path, ratios, n, mtype in (
            (self.sweep_manifest_path, (0.85, 0.15, 0.0), self.n_sweep_splits,
             "hyperparameter_sweep"),
            (self.outer_manifest_path, (0.70, 0.15, 0.15), self.n_outer_splits,
             "outer_evaluation"),
        ):
            provider = RandomSplitProvider(seed=self.seed, split_ratios=ratios)
            manifest = {
                "manifest_type": mtype,
                "dataset_fingerprint": fingerprint,
                "splits": [],
            }
            for i in range(n):
                train, val, test = provider.get_split(
                    i, subjects, instances, behaviors, allow_relaxed_fallback=True
                )
                manifest["splits"].append(
                    {"train": train, "validation": val, "test": test}
                )
            with open(path, "w", encoding="utf-8") as f:
                json.dump(manifest, f, indent=4)
            log_message(f"Saved {n} splits to {path}")

    # -- phase 2: sweep ---------------------------------------------------------

    def run_sweep(self) -> Optional[str]:
        fingerprint = self._fingerprint()
        keys, values = zip(*self.grid.items())
        combos = [dict(zip(keys, v)) for v in itertools.product(*values)]
        log_message(f"Sweep: {len(combos)} parameter combinations.")

        base_batch = int(self.fixed.get("batch_size", 1024))
        results = []
        for i, grid_params in enumerate(combos):
            t0 = time.time()
            params = dict(self.fixed)
            params.update(grid_params)
            params["batch_size"] = derive_batch_size_for_seq_len(
                seq_len=int(params["sequence_length"]),
                base_batch=base_batch,
                base_seq=31,
                batch_cap=base_batch,
            )
            log_message(
                f"--- Sweep job {i + 1}/{len(combos)}: {grid_params} "
                f"(batch {params['batch_size']}) ---"
            )
            task = self._make_task(params)
            provider = ManifestSplitProvider(self.sweep_manifest_path, fingerprint)
            param_str = "_".join(
                f"{k.replace('_', '-')}-{v}" for k, v in grid_params.items()
            )
            out_dir = os.path.join(self.experiments_dir, f"sweep_{param_str}")
            run_training_job(
                self.project, task, split_provider=provider, output_dir=out_dir,
                plot_suffix="runs", seed=self.seed,
            )

            report_path = os.path.join(out_dir, "performance_report.yaml")
            if os.path.exists(report_path):
                report = load_yaml(report_path)
                runs = report.get("run_results", [])
                if runs:
                    row = dict(params)
                    row["effective_tokens_per_step"] = (
                        params["batch_size"] * params["sequence_length"]
                    )
                    target = params.get("optimization_target", "weighted avg")
                    scores = [
                        r.get("validation_report", {}).get(target, {}).get("f1-score", 0.0)
                        for r in runs
                    ]
                    row[f"avg_validation_f1_{target.replace(' ', '_')}"] = (
                        sum(scores) / len(scores) if scores else 0.0
                    )
                    results.append(row)
            log_message(f"--- Sweep job {i + 1} done in {time.time() - t0:.1f}s ---")

        if not results:
            log_message("Sweep produced no results.", "WARN")
            return None
        ts = datetime.now().strftime("%Y%m%d_%H%M%S")
        out = os.path.join(
            self.experiments_dir, f"sweep_results_{self.dataset_name}_{ts}.csv"
        )
        pd.DataFrame(results).to_csv(out, index=False)
        log_message(f"Sweep results saved to {out}")
        return out

    # -- phase 3: evaluate ---------------------------------------------------------

    def run_final_evaluation(self) -> Optional[str]:
        fingerprint = self._fingerprint()
        provider = ManifestSplitProvider(self.outer_manifest_path, fingerprint)
        n_replicates = len(provider.manifest["splits"])
        params = dict(self.champion)
        params["num_runs"] = min(int(params.get("num_runs", n_replicates)), n_replicates)
        task = self._make_task(params)
        out_dir = os.path.join(
            self.experiments_dir,
            f"final_evaluation_{datetime.now().strftime('%Y%m%d_%H%M%S')}",
        )
        run_training_job(
            self.project, task, split_provider=provider, output_dir=out_dir,
            plot_suffix="replicates", seed=self.seed,
        )

        report_path = os.path.join(out_dir, "performance_report.yaml")
        if not os.path.exists(report_path):
            return None
        report = load_yaml(report_path)
        rows = []
        target = params.get("optimization_target", "weighted avg")
        for i, run in enumerate(report.get("run_results", [])):
            row = dict(self.champion)
            row["replicate"] = i + 1
            test = run.get("test_report", {}) or {}
            for b in task.behaviors:
                m = test.get(b, {})
                row[f"{b}_Test_F1"] = m.get("f1-score", 0)
                row[f"{b}_Test_Precision"] = m.get("precision", 0)
                row[f"{b}_Test_Recall"] = m.get("recall", 0)
            row[f"avg_test_f1_{target.replace(' ', '_')}"] = (
                test.get(target, {}).get("f1-score", 0)
            )
            rows.append(row)
        if not rows:
            return None
        ts = datetime.now().strftime("%Y%m%d_%H%M%S")
        out = os.path.join(
            self.experiments_dir,
            f"final_evaluation_results_{self.dataset_name}_{ts}.csv",
        )
        pd.DataFrame(rows).to_csv(out, index=False)
        log_message(f"Final evaluation results saved to {out}")
        return out

    # -- phase 4: train_final -----------------------------------------------------

    def train_final_model(self) -> Optional[str]:
        fingerprint = self._fingerprint()
        provider = ManifestSplitProvider(self.outer_manifest_path, fingerprint)
        train_s, val_s, test_s = provider.get_split(0, [], [], [])
        pool = list(train_s) + list(val_s)
        log_message(f"Final training pool: {len(pool)} subjects (train+val).")

        params = dict(self.champion)
        params.update(num_runs=1, num_trials=1, use_test=False, test_split=0.0)
        task = self._make_task(params)

        class FinalFitSplitProvider(SplitProvider):
            def get_split(self, run_index, all_subjects, all_instances, behaviors,
                          allow_relaxed_fallback=False):
                return pool, [], []

        out_dir = os.path.join(
            self.experiments_dir,
            f"final_train_run_{datetime.now().strftime('%Y%m%d_%H%M%S')}",
        )
        model_dir = run_training_job(
            self.project, task, split_provider=FinalFitSplitProvider(),
            output_dir=out_dir, seed=self.seed,
        )
        self._update_card_from_evaluation(task, train_s, val_s, test_s)
        return model_dir

    def _update_card_from_evaluation(self, task, train_s, val_s, test_s) -> None:
        """Write the rigorous evaluate-phase metrics + pool counts to the
        dataset card (reference: sweep_runner.py:478-547)."""
        try:
            csvs = glob.glob(
                os.path.join(self.experiments_dir, "final_evaluation_results_*.csv")
            )
            if not csvs:
                raise FileNotFoundError(
                    "No final_evaluation_results CSV found; run the 'evaluate' phase first."
                )
            eval_df = pd.read_csv(max(csvs, key=os.path.getctime))

            instances = self._all_instances()
            train_set = set(train_s) | set(val_s)
            test_set = set(test_s)
            counts = {"train": {}, "test": {}}
            frames = {"train": {}, "test": {}}
            for inst in instances:
                group = (
                    "train" if subject_of(inst) in train_set
                    else "test" if subject_of(inst) in test_set
                    else None
                )
                if group:
                    label = inst["label"]
                    counts[group][label] = counts[group].get(label, 0) + 1
                    frames[group][label] = frames[group].get(label, 0) + (
                        int(inst["end"]) - int(inst["start"]) + 1
                    )

            config = load_yaml(self.dataset.config_path)
            config["metrics"] = {}
            for b in task.behaviors:
                block = {}
                for metric, col in (
                    ("F1 Score", f"{b}_Test_F1"),
                    ("Precision", f"{b}_Test_Precision"),
                    ("Recall", f"{b}_Test_Recall"),
                ):
                    if col in eval_df.columns:
                        block[metric] = round(float(eval_df[col].mean()), 2)
                block["Train Inst (Frames)"] = (
                    f"{counts['train'].get(b, 0)} ({int(frames['train'].get(b, 0))})"
                )
                block["Test Inst (Frames)"] = (
                    f"{counts['test'].get(b, 0)} ({int(frames['test'].get(b, 0))})"
                )
                config["metrics"][b] = block
            dump_yaml(config, self.dataset.config_path)
            self.dataset.config = config
            # run_training_job reloads the project, replacing its Dataset
            # objects; keep the live copy in sync with what we just wrote.
            live = self.project.datasets.get(self.dataset_name)
            if live is not None:
                live.config = config
            log_message("Updated dataset card from evaluation metrics.")
        except Exception as e:
            log_message(f"Could not update dataset card: {e}", "ERROR")


def main(argv: Optional[List[str]] = None) -> None:
    import argparse

    parser = argparse.ArgumentParser(description="CBAS-TPU headless sweep runner")
    parser.add_argument("--project_path", required=True)
    parser.add_argument("--dataset_name", required=True)
    parser.add_argument(
        "--phase", required=True,
        choices=["precompute", "sweep", "evaluate", "train_final"],
    )
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args(argv)

    project = Project(args.project_path)
    runner = SweepRunner(project, args.dataset_name, seed=args.seed)
    phase = {
        "precompute": runner.precompute_splits,
        "sweep": runner.run_sweep,
        "evaluate": runner.run_final_evaluation,
        "train_final": runner.train_final_model,
    }[args.phase]
    phase()


if __name__ == "__main__":
    main()
