"""Segmentation training pipeline test: GT generation -> dataset -> trainer."""
import numpy as np
import pytest
from PIL import Image

from citlab_as_tpu.stages.ground_truth import RegionGroundTruthGenerator
from citlab_as_tpu.train.seg_input_pipeline import (
    SegmentationDataset, find_gt_examples,
)
from citlab_as_tpu.train.seg_trainer import TrainerSegmentation


PAGE = """<?xml version="1.0"?>
<PcGts xmlns="http://schema.primaresearch.org/PAGE/gts/pagecontent/2013-07-15">
  <Metadata><Creator>c</Creator><Created>t</Created><LastChange>t</LastChange></Metadata>
  <Page imageFilename="{name}.png" imageWidth="200" imageHeight="200">
    <TextRegion id="tr_1" type="paragraph">
      <Coords points="20,20 180,20 180,100 20,100"/>
      <TextLine id="tl"><Coords points="20,20 180,20 180,60 20,60"/>
        <Baseline points="20,50 180,50"/>
        <TextEquiv><Unicode>t</Unicode></TextEquiv></TextLine>
    </TextRegion>
    <SeparatorRegion id="sep"><Coords points="20,150 180,150 180,156 20,156"/></SeparatorRegion>
  </Page>
</PcGts>"""


@pytest.fixture
def gt_dir(tmp_path):
    for name in ("a", "b"):
        img = np.full((200, 200), 255, np.uint8)
        img[30:60, 30:170] = 0
        Image.fromarray(img).save(tmp_path / f"{name}.png")
        (tmp_path / "page").mkdir(exist_ok=True)
        (tmp_path / "page" / f"{name}.xml").write_text(PAGE.format(name=name))
    gen = RegionGroundTruthGenerator(
        [str(tmp_path / "a.png"), str(tmp_path / "b.png")],
        region_types=["TextRegion", "SeparatorRegion"])
    out = tmp_path / "gt"
    gen.run_ground_truth_generation(str(out))
    return str(out)


def test_find_and_crop(gt_dir):
    examples = find_gt_examples(gt_dir)
    assert len(examples) == 2
    assert len(examples[0][1]) == 3  # TextRegion, SeparatorRegion, other
    ds = SegmentationDataset(examples, crop_size=(128, 128), seed=0)
    batch = next(iter(ds.batches(2, 1)))
    assert batch["image"].shape == (2, 128, 128, 1)
    assert batch["label"].shape == (2, 128, 128)
    assert set(np.unique(batch["label"])).issubset({0, 1, 2})
    assert batch["mask"].min() >= 0


def test_seg_trainer_two_epochs(gt_dir, tmp_path):
    trainer = TrainerSegmentation(
        str(tmp_path / "model"), gt_dir, eval_gt_dir=gt_dir,
        flags={"epochs": 2, "steps_per_epoch": 2, "batch_size": 1,
               "crop_size": (64, 64), "eval_steps": 1, "n_classes": 3},
        graph_params={"graph": "RU", "featRoot": 4, "scale_space_num": 3,
                      "res_depth": 1})
    result = trainer.train()
    assert len(result["history"]) == 2
    assert "accuracy" in result["best_metrics"]
    assert np.isfinite(result["history"][-1]["loss"])
