"""Sweep runner tests: batch derivation, manifests, mini end-to-end sweep."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from cbas_tpu.app.sweep import SweepRunner, derive_batch_size_for_seq_len
from cbas_tpu.core import hdf5_store
from cbas_tpu.core.project import Project
from cbas_tpu.utils.naming import h5_path_for_video

DIM = 16
FRAMES = 120


def test_batch_derivation_token_budget():
    # Reference semantics: batch*seq ~= 1024*31, snapped down to 32s, capped.
    assert derive_batch_size_for_seq_len(31) == 1024
    assert derive_batch_size_for_seq_len(63) == 480   # 1024*31/63 = 503 -> 480
    assert derive_batch_size_for_seq_len(95) == 320   # 334 -> 320
    assert derive_batch_size_for_seq_len(9999) == 32  # floor at minimum


def test_batch_derivation_matches_reference_oracle():
    """Differential oracle: our derivation vs the GENUINE reference
    derive_batch_size_for_seq_len (/root/reference/sweep_runner.py:85-97),
    over every grid point a sweep could plausibly visit.

    The reference function is extracted from the source AST (the module's
    top level imports the whole torch backend and builds a live experiment
    grid, which a unit test must not execute); the two helpers are pure.
    """
    import ast

    src_path = "/root/reference/sweep_runner.py"
    if not os.path.exists(src_path):
        pytest.skip("reference sweep_runner not available")
    tree = ast.parse(open(src_path).read())
    wanted = {"_nice_multiple", "derive_batch_size_for_seq_len"}
    ns: dict = {}
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in wanted:
            exec(compile(ast.Module([node], []), src_path, "exec"), ns)
    assert wanted <= ns.keys(), "reference helpers not found in sweep_runner.py"
    ref = ns["derive_batch_size_for_seq_len"]

    for seq_len in (1, 3, 9, 15, 31, 33, 63, 95, 127, 255, 1023, 9999):
        for base_batch in (32, 256, 512, 1024, 2048):
            for base_seq in (15, 31, 63):
                for snap in (16, 32, 64):
                    got = derive_batch_size_for_seq_len(
                        seq_len, base_batch=base_batch, base_seq=base_seq,
                        batch_cap=base_batch, minimum=32, snap=snap,
                    )
                    want = ref(
                        seq_len, base_batch=base_batch, base_seq=base_seq,
                        batch_cap=base_batch, minimum=32, snap=snap,
                    )
                    assert got == want, (seq_len, base_batch, base_seq, snap)


@pytest.fixture(scope="module")
def project(tmp_path_factory):
    root = tmp_path_factory.mktemp("sweepproj")
    proj = Project.create_project(str(root), "p")
    rng = np.random.default_rng(0)
    ds = proj.create_dataset("d", ["walk", "rest"], [])
    labels = {"walk": [], "rest": []}
    for s in range(8):
        rec = os.path.join(proj.recordings_dir, "sess", f"m{s}")
        os.makedirs(rec)
        video = os.path.join(rec, f"m{s}_00001.mp4")
        open(video, "wb").close()
        feats = np.zeros((FRAMES, DIM), np.float16)
        half = FRAMES // 2
        feats[:half] = rng.normal(1.5, 1.0, (half, DIM))
        feats[half:] = rng.normal(-1.5, 1.0, (FRAMES - half, DIM))
        with hdf5_store.EmbeddingWriter(
            h5_path_for_video(video), encoder_identifier=proj.encoder_model_identifier,
            embed_dim=DIM,
        ) as w:
            w.append(feats)
        rel = os.path.relpath(video, proj.path)
        labels["walk"].append({"video": rel, "start": 10, "end": 40, "label": "walk"})
        labels["rest"].append({"video": rel, "start": half + 10, "end": half + 40, "label": "rest"})
    ds.labels["labels"] = labels
    ds.save_labels()
    proj.reload()
    return proj


TINY = dict(epochs=1, num_runs=1, num_trials=1, batch_size=64, patience=1)


@pytest.fixture(scope="module")
def runner(project):
    return SweepRunner(
        project,
        "d",
        parameter_grid={"learning_rate": [5e-3], "sequence_length": [7]},
        fixed=dict(TINY, training_method="oversampling", use_test=False,
                   test_split=0.0, optimization_target="weighted avg",
                   lstm_hidden_size=8, lstm_layers=1),
        champion=dict(TINY, learning_rate=5e-3, sequence_length=7,
                      lstm_hidden_size=8, lstm_layers=1, weight_decay=0.0,
                      label_smoothing=0.0, training_method="oversampling",
                      optimization_target="weighted avg", use_test=True,
                      test_split=0.15, num_runs=2),
        n_sweep_splits=2,
        n_outer_splits=2,
    )


def test_precompute_writes_fingerprinted_manifests(runner, project):
    runner.precompute_splits()
    for path, n in ((runner.sweep_manifest_path, 2), (runner.outer_manifest_path, 2)):
        doc = json.load(open(path))
        assert len(doc["splits"]) == n
        assert doc["dataset_fingerprint"] == runner._fingerprint()
        s = doc["splits"][0]
        assert s["train"] and s["validation"] is not None


def test_sweep_phase(runner):
    out = runner.run_sweep()
    assert out and os.path.exists(out)
    df = pd.read_csv(out)
    assert len(df) == 1  # one grid combo
    assert "avg_validation_f1_weighted_avg" in df.columns
    assert df["effective_tokens_per_step"].iloc[0] == df["batch_size"].iloc[0] * 7
    # batch derived from token budget (base 64 @ seq31 -> seq7 caps at 64)
    assert df["batch_size"].iloc[0] == 64


def test_evaluate_phase(runner):
    out = runner.run_final_evaluation()
    assert out and os.path.exists(out)
    df = pd.read_csv(out)
    assert len(df) == 2  # two replicates
    assert {"walk_Test_F1", "rest_Test_Precision", "replicate"} <= set(df.columns)


def test_train_final_phase(runner, project):
    model_dir = runner.train_final_model()
    assert model_dir and os.path.exists(os.path.join(model_dir, "model.npz"))
    # the deployable bundle is PROMOTED into the project's models dir
    # (experiment runs keep theirs inside their own output_dir)
    assert model_dir == os.path.join(project.models_dir, "d_model")
    cfg = project.datasets["d"].config
    assert "metrics" in cfg
    assert "Train Inst (Frames)" in cfg["metrics"]["walk"]
    assert "F1 Score" in cfg["metrics"]["walk"]


def test_sweep_fanout_two_jobs(project):
    """jobs=2 drains a 2-combo grid through two claim-guarded worker
    processes and the parent collects both rows; completed combos are
    skipped on a rerun (resume semantics)."""
    import os as _os

    _os.environ["CBAS_SWEEP_NO_CHIP_BINDING"] = "1"
    _os.environ["CBAS_FORCE_CPU"] = "1"
    try:
        r2 = SweepRunner(
            project,
            "d",
            parameter_grid={"learning_rate": [5e-3, 1e-3], "sequence_length": [7]},
            fixed=dict(TINY, training_method="oversampling", use_test=False,
                       test_split=0.0, optimization_target="weighted avg",
                       lstm_hidden_size=8, lstm_layers=1),
            n_sweep_splits=2,
            n_outer_splits=2,
        )
        out = r2.run_sweep(jobs=2)
        assert out and os.path.exists(out)
        df = pd.read_csv(out)
        assert len(df) == 2 and set(df["learning_rate"]) == {5e-3, 1e-3}
        # resume: both combos have reports now, a rerun only re-collects
        t0 = __import__("time").time()
        out2 = r2.run_sweep(jobs=1)
        assert out2 and len(pd.read_csv(out2)) == 2
        assert __import__("time").time() - t0 < 30  # no retraining happened
        leftovers = [f for f in os.listdir(r2.experiments_dir) if f.endswith(".claim")]
        assert leftovers == []
    finally:
        _os.environ.pop("CBAS_SWEEP_NO_CHIP_BINDING", None)
        _os.environ.pop("CBAS_FORCE_CPU", None)


def test_failed_combo_releases_claim_and_drain_continues(project, monkeypatch):
    """One bad combo must not stall the grid: its claim is released (a leaked
    claim blocks retries for the full 6 h TTL) and the remaining combos still
    run (r3 review finding)."""
    import cbas_tpu.app.sweep as sweep_mod

    # grid values distinct from the other tests': this test needs FRESH
    # (report-less) combo out_dirs in the shared module-scope project
    r = SweepRunner(
        project,
        "d",
        parameter_grid={"learning_rate": [2e-3, 3e-3], "sequence_length": [7]},
        fixed=dict(TINY, training_method="oversampling", use_test=False,
                   test_split=0.0, optimization_target="weighted avg",
                   lstm_hidden_size=8, lstm_layers=1),
        n_sweep_splits=2,
        n_outer_splits=2,
    )
    r.precompute_splits()
    combos = r._sweep_combos()
    assert len(combos) == 2

    ran = []

    def boom_then_ok(project_, task, **kw):
        ran.append(kw["output_dir"])
        if len(ran) == 1:
            raise RuntimeError("synthetic OOM")
        os.makedirs(kw["output_dir"], exist_ok=True)
        with open(os.path.join(kw["output_dir"], "performance_report.yaml"), "w") as f:
            f.write("run_results: []\n")

    monkeypatch.setattr(sweep_mod, "run_training_job", boom_then_ok)
    failed = r._drain_sweep_combos(combos)

    assert failed == 1  # ... and the failure is reported, not swallowed
    assert len(ran) == 2  # the second combo still ran after the first failed
    leftovers = [f for f in os.listdir(r.experiments_dir) if f.endswith(".claim")]
    assert leftovers == []  # the failed combo's claim was released

    # run_sweep must surface the incomplete grid to the caller/shell: a
    # pipeline chaining `sweep && evaluate` must not pick a champion from a
    # partially drained grid (r3 review finding).
    ran.clear()
    for combo in combos:
        rp = os.path.join(combo["out_dir"], "performance_report.yaml")
        if os.path.exists(rp):
            os.unlink(rp)
    with pytest.raises(RuntimeError, match="failed"):
        r.run_sweep(jobs=1)


def test_sweep_and_outer_manifests_use_disjoint_seed_streams(project):
    """The reference seeds both split providers identically, making sweep
    split i's validation subjects exactly outer split i's test subjects
    (both are shuffled[0.85n:] of the same seeded shuffle) — hyperparameters
    were being selected on the reported held-out test set. Deliberate
    deviation: the outer manifest uses a disjoint seed stream."""
    r = SweepRunner(project, "d", n_sweep_splits=4, n_outer_splits=4)
    r.precompute_splits()
    sweep = json.load(open(r.sweep_manifest_path))["splits"]
    outer = json.load(open(r.outer_manifest_path))["splits"]
    coincident = [
        i
        for i in range(4)
        if set(sweep[i]["validation"]) == set(outer[i]["test"])
    ]
    assert coincident == []  # deterministic under seed=42 with 8 subjects
