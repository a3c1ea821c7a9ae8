"""Adversarial-corpus quality oracle (round-4 VERDICT #7).

Extends the hard-corpus blind e2e (tests/test_trained_models.py) with the
two failure modes it did not cover:

- the DESKEW path (ops/image_utils.get_rotation_angle, image_stats.py:32-48
  parity): recovering a known injected skew from an adversarial page;
- multi-column pages with NO drawn separators at all (rule_grey=255 erases
  the printed rules, so the separator net sees nothing and the article
  partition must come from the layout gaps + the GNN alone).
"""
import os
import shutil
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SEP_CKPT = os.path.join(REPO, "models_ckpt", "separator")
HEAD_CKPT = os.path.join(REPO, "models_ckpt", "heading")
GNN_PIPE_CKPT = os.path.join(REPO, "models_ckpt", "gnn_pipeline", "best", "f1")


def _ckpt_exists(path):
    return os.path.isdir(path) and any(d.isdigit() for d in os.listdir(path))


def test_deskew_recovers_corpus_skew(tmp_path):
    """The projection-profile deskew must recover the injected rotation of
    an adversarial page (noise + texture + skew) to within the search
    step."""
    from PIL import Image

    from citlab_as_tpu.ops.image_utils import get_rotation_angle
    from scripts.hard_corpus import make_hard_article_page

    rng = np.random.RandomState(11)
    img_path, _, _, skew = make_hard_article_page(
        str(tmp_path), "sk", rng, max_skew_deg=1.6, noise_frac=0.03,
        dense=False)
    assert abs(skew) > 0.4, "seed must produce a visible skew"
    img = np.asarray(Image.open(img_path).convert("L"), np.float32)
    # dark text must dominate the projection profile -> invert
    _, angle = get_rotation_angle(255.0 - img, delta=0.2, limit=2.0)
    # rotating by `angle` should undo the injected skew
    assert angle == pytest.approx(skew, abs=0.3), (
        f"deskew estimated {angle:+.2f} for injected {skew:+.2f}")


@pytest.mark.slow
@pytest.mark.skipif(
    not (_ckpt_exists(SEP_CKPT) and _ckpt_exists(HEAD_CKPT)
         and os.path.isdir(GNN_PIPE_CKPT)),
    reason="needs all three checkpoints")
def test_blind_e2e_no_separator_corpus(tmp_path):
    """Multi-column pages whose separator rules are fully ERASED
    (rule_grey=255), plus skew and noise: the separator stage contributes
    nothing, so the GNN + layout-gap features carry the whole partition.
    Measured AS F1 on this mode: see PARITY.md quality table; the threshold
    trails the measurement by <= 2 points."""
    from citlab_as_tpu.cli.run_full_workflow import run_full_workflow
    from citlab_as_tpu.cli.run_measure import main as measure_main
    from citlab_as_tpu.pagexml import Page
    from scripts.hard_corpus import make_hard_article_page

    work = str(tmp_path)
    rng = np.random.RandomState(7)
    imgs, gts = [], []
    for i in range(2):
        img, page, n_articles, _ = make_hard_article_page(
            work, f"n{i}", rng, max_skew_deg=2.0, noise_frac=0.03,
            rule_grey=255)
        assert n_articles >= 4
        gt_dir = os.path.join(work, "gt", "page")
        os.makedirs(gt_dir, exist_ok=True)
        gt_path = os.path.join(gt_dir, f"n{i}.xml")
        shutil.copy(page, gt_path)
        p = Page(page)
        tls = p.get_textlines()
        for tl in tls:
            tl.set_article_id(None)
        p.set_textline_attr(tls)
        p.write_page_xml(page)
        imgs.append(img)
        gts.append(gt_path)

    result = run_full_workflow(
        imgs, separator_model_dir=SEP_CKPT, heading_model_dir=HEAD_CKPT,
        gnn_model_dir=GNN_PIPE_CKPT, clustering_method="dbscan",
        out_dir=os.path.join(work, "out"))
    gt_lst = os.path.join(work, "gt.lst")
    hy_lst = os.path.join(work, "hy.lst")
    open(gt_lst, "w").write("\n".join(gts) + "\n")
    open(hy_lst, "w").write("\n".join(result["clustered"]) + "\n")
    out = measure_main(["--path_to_gt_xml_lst", gt_lst,
                        "--path_to_hy_xml_lst", hy_lst,
                        "--min_tol", "10", "--max_tol", "30"])
    as_r, as_p, as_f = out["as"]
    bd_r, bd_p, bd_f = out["bd"]
    assert bd_f > 0.9, f"baseline-detection F1 {bd_f} too low"
    # measured 0.9886 (this corpus, seed 7) -> threshold trails by 2 points
    assert as_f > 0.96, (
        f"no-separator AS F1 {as_f} too low (R={as_r}, P={as_p})")
