"""Tests: min_run_example, plot_net_output helpers, BNL GT, KWS helpers."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from citlab_as_tpu.cli.min_run_example import main as min_run_main
from citlab_as_tpu.cli.plot_net_output import (
    apply_mask, compute_accuracy, plot_image_with_net_output, random_colors,
)
from citlab_as_tpu.stages.bnl_ground_truth import (
    BNLGroundTruthGenerator, BNLHeaderGroundTruthGenerator,
)
from citlab_as_tpu.utils.kws_eval import (
    are_vertically_close, evaluate_queries, get_kws_from_query,
    list_img_intersect,
)


def test_min_run_example(tmp_path):
    spc, evaler = min_run_main([
        "--work_dir", str(tmp_path / "work"),
        "--out_dir", str(tmp_path / "out"), "--demo"])
    assert os.path.exists(tmp_path / "out" / "comparison.xlsx")
    assert os.path.exists(tmp_path / "out" / "comparison.csv")
    stat = evaler.winnerStatDict["example"]
    good = [m for m in stat if "good" in m][0]
    merged = [m for m in stat if "merged" in m][0]
    assert stat[good]["all"] >= stat[merged]["all"]


def test_plot_net_output_helpers(tmp_path):
    colors = random_colors(5)
    assert len(colors) == 5
    img = np.full((20, 20, 3), 128, np.uint8)
    mask = np.zeros((20, 20), np.uint8)
    mask[5:10, 5:10] = 1
    out = apply_mask(img, mask, colors[0])
    assert (out[6, 6] != img[6, 6]).any()
    assert (out[0, 0] == img[0, 0]).all()
    assert compute_accuracy(mask, mask) == 1.0
    assert compute_accuracy(mask, 1 - mask) == 0.0

    net = np.zeros((20, 20, 2), np.float32)
    net[5:10, 5:10, 0] = 1.0
    net[..., 1] = 1 - net[..., 0]
    save = tmp_path / "overlay.png"
    plot_image_with_net_output(img, net, save_path=str(save))
    assert save.exists()


BNL_PAGE = """<?xml version="1.0"?>
<PcGts xmlns="http://schema.primaresearch.org/PAGE/gts/pagecontent/2013-07-15">
  <Metadata><Creator>c</Creator><Created>t</Created><LastChange>t</LastChange></Metadata>
  <Page imageFilename="p.png" imageWidth="300" imageHeight="300">
    <TextRegion id="tr_text" type="paragraph">
      <Coords points="10,150 290,150 290,290 10,290"/>
      <TextLine id="t1"><Coords points="10,150 290,150 290,190 10,190"/>
        <Baseline points="10,180 290,180"/><TextEquiv><Unicode>x</Unicode></TextEquiv></TextLine>
    </TextRegion>
    <TextRegion id="tr_title" type="paragraph" custom="structure {type:title; subtype:headline;}">
      <Coords points="10,10 290,10 290,60 10,60"/>
      <TextLine id="t2"><Coords points="10,10 290,10 290,50 10,50"/>
        <Baseline points="10,40 290,40"/><TextEquiv><Unicode>HEAD</Unicode></TextEquiv></TextLine>
    </TextRegion>
    <SeparatorRegion id="sep"><Coords points="10,100 290,100 290,104 10,104"/></SeparatorRegion>
  </Page>
</PcGts>"""


def test_bnl_gt_generator(tmp_path):
    Image.fromarray(np.full((300, 300), 255, np.uint8)).save(tmp_path / "p.png")
    (tmp_path / "page").mkdir()
    (tmp_path / "page" / "p.xml").write_text(BNL_PAGE)
    gen = BNLGroundTruthGenerator([str(tmp_path / "p.png")])
    gen.create_ground_truth_images()
    channels = gen.gt_imgs_lst[0]
    assert len(channels) == 7  # 6 + other
    text_ch, _, headline_ch = channels[0], channels[1], channels[2]
    assert text_ch[200, 150] == 255        # body text region
    assert headline_ch[30, 150] == 255     # headline title
    assert text_ch[30, 150] == 0           # title not in text channel
    sep_ch = channels[5]
    assert sep_ch[102, 150] == 255

    hdr = BNLHeaderGroundTruthGenerator([str(tmp_path / "p.png")])
    hdr.create_ground_truth_images()
    assert len(hdr.gt_imgs_lst[0]) == 2  # header + other
    assert hdr.gt_imgs_lst[0][0][30, 150] == 255


def test_kws_helpers():
    # vertically close: second line below first, horizontally offset
    assert are_vertically_close("1500,100;1700,100", "100,150;400,150")
    assert not are_vertically_close("100,100;400,100", "100,500;400,500")

    kws = {"CAT.*": [], "DOG": []}
    assert get_kws_from_query(kws, "cats") == ["CAT.*"]

    l1 = [("img1", "b", "l", 0.9), ("img2", "b", "l", 0.8)]
    l2 = [("img2", "b", "l", 0.7), ("img3", "b", "l", 0.6)]
    inter = list_img_intersect(l1, l2)
    assert all(v[0] == "img2" for v in inter)


def test_kws_evaluate_queries():
    kws_results = {
        "HELLO": [{"image": "/storage/a/x.jpg", "bl": "0,0;10,0",
                   "line": "l1", "conf": 0.9}],
        "WORLD": [{"image": "/storage/a/x.jpg", "bl": "0,5;10,5",
                   "line": "l2", "conf": 0.8},
                  {"image": "/b/y.jpg", "bl": "0,0;10,0",
                   "line": "l3", "conf": 0.7}],
    }
    out = evaluate_queries(kws_results, ["hello AND world", "world"])
    assert all(v[0] == "x.jpg" for v in out["hello AND world"])
    assert len(out["world"]) == 2
