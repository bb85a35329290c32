"""The shipped example configs run VERBATIM (VERDICT r4 item 5).

The reference's entire UX is "specs.json in, results out"
(ref: README.md:99, examples/ADNI/minimal_eikonal/specs.json:1-40). These
tests execute the stock spec FILES byte-for-byte: tiny synthetic data is
generated with the real ``examples/make_example_data.py`` CLI into a temp
tree, each shipped ``specs.json`` is copied verbatim into the same relative
layout, and only sizes/frequencies are shrunk through the documented
``MSD_SPEC_OVERRIDES`` env facility (msd_tpu/workspace.py). Any key typo or
path drift in the 8 example specs now fails CI.

Coverage:
* all 8 stock specs pass ``check_experiment_inputs.py`` (path/label/split
  resolution) — catches drift in every config
* full train -> reconstruct -> evaluate through the CLIs on the stock
  ADNI/minimal_eikonal spec (the flagship config, stock 8x512 network)
* stage-2 ``train_MLP_VAE_deep_sdf.py`` on the stock
  ADNI/MLP_VAE_SDF_disentangle_all_true_label_age spec, chained through
  its shipped relative ``../minimal_eikonal/...`` pretrained paths
* stage-2 on the pseudo-label config (LabelMixing + pseudo_label.pt)
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STOCK_EXPERIMENTS = [
    "ADNI/minimal_eikonal",
    "ADNI/minimal_eikonal_gmm",
    "ADNI/MLP_VAE_SDF_disentangle_all_true_label_age",
    "ADNI/MLP_VAE_SDF_disentangle_pseudo_label_with_age",
    "OAI-ZIB/minimal_eikonal",
    "OAI-ZIB/minimal_eikonal_gmm",
    "OAI-ZIB/MLP_VAE_SDF_disentangle_all_true_label_age",
    "OAI-ZIB/MLP_VAE_SDF_disentangle_pseudo_label_with_age",
]

# Size/frequency-only shrink: every other key comes verbatim from the
# shipped specs.json (incl. the stock 8x512/latent-256 network). Stage 1
# needs enough epochs that the stock net develops a zero crossing (an
# undertrained decoder has no surface and create_mesh warn-and-continues,
# reference semantics deep_sdf/mesh.py:118-124 — the reconstruct assert
# below depends on a real mesh coming out).
SMOKE_OVERRIDES = {
    "NumEpochs": 40,
    "SnapshotFrequency": 20,
    "AdditionalSnapshots": [],
    "SamplesPerScene": 512,
    "ScenesPerBatch": 4,
    "EvalTrainFrequency": 0,
    "EvalTestFrequency": 0,
    "EvalGridResolution": 32,
    "LogFrequency": 10,
}

# Stage-2 smoke: the VAE trains on stage-1 latents; 3 epochs exercises
# every spec key without needing convergence.
SMOKE_OVERRIDES_S2 = dict(SMOKE_OVERRIDES, NumEpochs=3, SnapshotFrequency=2)


def _run_cli(script, *args, cwd, overrides=None, timeout=1200):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO  # no axon sitecustomize -> CPU backend
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    if overrides is not None:
        env["MSD_SPEC_OVERRIDES"] = json.dumps(overrides)
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, script), *map(str, args)],
        capture_output=True, text=True, env=env, cwd=cwd, timeout=timeout,
    )
    assert res.returncode == 0, (
        f"{script} {args} failed (rc={res.returncode})\n"
        f"stdout tail: {res.stdout[-1500:]}\nstderr tail: {res.stderr[-2500:]}"
    )
    return res


@pytest.fixture(scope="module")
def stock_tree(tmp_path_factory):
    """Temp tree with tiny generated example data + the stock specs,
    byte-identical to the shipped ones, in the shipped relative layout."""
    root = tmp_path_factory.mktemp("stock")
    ex_root = root / "examples"
    _run_cli(
        "examples/make_example_data.py",
        "--root", ex_root, "--num_adni", "8", "--num_femur", "6",
        "--samples", "6000",
        cwd=root,
    )
    for rel in STOCK_EXPERIMENTS:
        src = os.path.join(REPO, "examples", rel, "specs.json")
        dst = ex_root / rel / "specs.json"
        dst.parent.mkdir(parents=True, exist_ok=True)
        shutil.copyfile(src, dst)  # verbatim: byte-for-byte
        assert open(src, "rb").read() == open(dst, "rb").read()
    return root


@pytest.mark.e2e
@pytest.mark.parametrize("rel", STOCK_EXPERIMENTS)
def test_stock_spec_validates(stock_tree, rel):
    """check_experiment_inputs resolves every path/split/label the stock
    spec names (ref: check_experiment_inputs.py preflight role)."""
    _run_cli(
        "check_experiment_inputs.py", "-e", stock_tree / "examples" / rel,
        cwd=stock_tree, timeout=300,
    )


@pytest.mark.e2e
def test_stock_stage1_train_reconstruct_evaluate(stock_tree):
    """The flagship stock config end-to-end: train_deep_sdf.py ->
    reconstruct.py -> evaluate.py, spec keys verbatim."""
    exp = stock_tree / "examples" / "ADNI" / "minimal_eikonal"
    _run_cli("train_deep_sdf.py", "-e", exp, cwd=stock_tree,
             overrides=SMOKE_OVERRIDES)
    import msd_tpu.workspace as ws

    assert (exp / ws.model_params_subdir / "latest.pth").is_file()
    assert (exp / ws.latent_codes_subdir / "latest.pth").is_file()
    assert (exp / ws.optimizer_params_subdir / "latest.pth").is_file()
    assert (exp / ws.logs_filename).is_file()

    spec = json.load(open(exp / "specs.json"))
    data = stock_tree / spec["DataSource"]
    test_split = stock_tree / spec["TestSplit"]
    _run_cli(
        "reconstruct.py", "-e", exp, "-c", "latest", "-d", data,
        "-s", test_split, "--iters", 5, "--mesh_resolution", 32,
        cwd=stock_tree, overrides=SMOKE_OVERRIDES,
    )
    # reconstruct.py names the output dir by the RESOLVED checkpoint epoch
    # (ref: reconstruct.py:154-357 uses saved epoch), i.e. Reconstructions/3/
    plys = list((exp / ws.reconstructions_subdir).glob(
        f"*/{ws.reconstruction_meshes_subdir}/*.ply"))
    assert plys, f"no reconstructed meshes under {exp / ws.reconstructions_subdir}"
    epoch_dirname = plys[0].parent.parent.name
    _run_cli(
        "evaluate.py", "-e", exp, "-c", epoch_dirname, "-d", data,
        "-s", test_split, cwd=stock_tree, overrides=SMOKE_OVERRIDES,
    )
    csvs = list((exp / ws.evaluation_subdir).glob("**/*.csv"))
    assert csvs, "evaluate.py produced no CSV"


@pytest.mark.e2e
def test_stock_stage2_true_label(stock_tree):
    """Stage-2 stock config, chained through its shipped relative
    ../minimal_eikonal pretrained paths (run after the stage-1 test)."""
    exp1 = stock_tree / "examples" / "ADNI" / "minimal_eikonal"
    if not (exp1 / "ModelParameters" / "latest.pth").is_file():
        pytest.skip("stage-1 stock test must run first in this module")
    exp = stock_tree / "examples" / "ADNI" / "MLP_VAE_SDF_disentangle_all_true_label_age"
    _run_cli("train_MLP_VAE_deep_sdf.py", "-e", exp, cwd=stock_tree,
             overrides=SMOKE_OVERRIDES_S2)
    assert (exp / "ModelParameters" / "latest.pth").is_file()
    assert (exp / "LatentCodes" / "latest.pth").is_file()


@pytest.mark.e2e
def test_stock_stage2_pseudo_label(stock_tree):
    """The pseudo-label stock config: LabelMixing=True consuming the
    generated pseudo_label.pt next to labels.pt."""
    exp1 = stock_tree / "examples" / "ADNI" / "minimal_eikonal"
    if not (exp1 / "ModelParameters" / "latest.pth").is_file():
        pytest.skip("stage-1 stock test must run first in this module")
    exp = stock_tree / "examples" / "ADNI" / "MLP_VAE_SDF_disentangle_pseudo_label_with_age"
    _run_cli("train_MLP_VAE_deep_sdf.py", "-e", exp, cwd=stock_tree,
             overrides=SMOKE_OVERRIDES_S2)
    assert (exp / "ModelParameters" / "latest.pth").is_file()
