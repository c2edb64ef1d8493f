"""CoOp 11-dataset zero-shot surface: builders, templates, prune+eval legs.

Reference: CoOp/scripts/coop/ecoflap_wanda.sh:16 (the 11-dataset loop),
CoOp/trainers/zsclip.py:13-43 (CUSTOM_TEMPLATES + classname normalization),
CoOp/datasets/{caltech101,eurosat}.py (renames/ignored dirs).
"""

import json
import os

import numpy as np
import pytest

from ecoflap_tpu.core.registry import registry
from ecoflap_tpu.data import datasets as _ds  # noqa: F401 (registers)
from ecoflap_tpu.data.coop import (
    COOP_DATASETS,
    COOP_TEMPLATES,
    coop_prompts,
    normalize_classname,
)


def _make_folder(root, classes, per_class=2, size=16):
    from PIL import Image

    rng = np.random.default_rng(0)
    for c in classes:
        d = os.path.join(root, c)
        os.makedirs(d, exist_ok=True)
        for i in range(per_class):
            arr = rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"{i}.png"))


def test_all_eleven_datasets_registered():
    assert len(COOP_DATASETS) == 11
    for name in COOP_DATASETS:
        assert registry.get("builder", name) is not None, name
        assert name in COOP_TEMPLATES, name


def test_eurosat_builder_renames(tmp_path):
    _make_folder(str(tmp_path), ["AnnualCrop", "SeaLake"])
    ds = registry.get("builder", "eurosat")({"vis_root": str(tmp_path)})
    assert ds.classnames == ["Annual Crop Land", "Sea or Lake"]
    prompts = coop_prompts("eurosat", ds.classnames)
    assert prompts[0] == "a centered satellite photo of Annual Crop Land."


def test_caltech_ignored_and_renamed(tmp_path):
    _make_folder(str(tmp_path),
                 ["BACKGROUND_Google", "Faces", "Faces_easy", "airplanes",
                  "water_lilly"])
    ds = registry.get("builder", "caltech101")({"vis_root": str(tmp_path)})
    assert ds.classnames == ["face", "airplane", "water lilly"]
    # labels stay aligned with the surviving classes
    labels = sorted({lab for _, lab in ds.samples})
    assert labels == [0, 1, 2]
    assert normalize_classname("caltech101", "Motorbikes") == "motorbike"


def test_ucf101_template():
    assert coop_prompts("ucf101", ["Apply Eye Makeup"]) == [
        "a photo of a person doing Apply Eye Makeup."]


@pytest.mark.parametrize("dataset,classes", [
    ("eurosat", ["AnnualCrop", "Forest", "Highway", "River"]),
    ("dtd", ["banded", "blotchy", "bubbly", "woven"]),
])
def test_coop_prune_and_eval_legs(dataset, classes, tmp_path):
    """The launcher's two legs (cli.prune --calib/--dataset with the CoOp
    contrastive protocol, cli.evaluate --prompt_templates coop) run
    end-to-end on a synthetic imagefolder at tiny scale."""
    import subprocess
    import sys

    data = tmp_path / dataset
    _make_folder(str(data), classes, per_class=2)
    out = tmp_path / "out"
    env = dict(os.environ)

    res = subprocess.run(
        [sys.executable, "-m", "ecoflap_tpu.cli.prune",
         "--model", "clip", "--model_scale", "tiny", "--platform", "cpu",
         "--pruning_method", "clip_wanda_pruner",
         "--prune_spec", "2-0.6-1.0-1.0",
         "--dataset", dataset, "--calib", str(data),
         "--num_samples", "4", "--batch_size", "2",
         "--output_dir", str(out), "--save_pruned"],
        capture_output=True, text=True, timeout=600, env=env)
    assert res.returncode == 0, res.stderr[-2000:]
    result = json.loads(res.stdout.strip().splitlines()[-1])
    assert 0.3 <= result["prunable_sparsity"] <= 0.5
    ckpt = result["checkpoint"]

    res = subprocess.run(
        [sys.executable, "-m", "ecoflap_tpu.cli.evaluate",
         "--model", "clip", "--model_scale", "tiny", "--platform", "cpu",
         "--task", "classification", "--dataset", dataset,
         "--vis_root", str(data), "--prompt_templates", "coop",
         "--checkpoint", ckpt, "--batch_size", "2",
         "--output_dir", str(out)],
        capture_output=True, text=True, timeout=600, env=env)
    assert res.returncode == 0, res.stderr[-2000:]
    metrics = json.loads(res.stdout.strip().splitlines()[-1])
    assert np.isfinite(metrics["agg_metrics"])
