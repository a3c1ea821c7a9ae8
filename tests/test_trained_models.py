"""Integration tests with the committed synthetic-trained checkpoints.

The checkpoints under models_ckpt/ were produced by
scripts/train_synthetic_separator.py on a v5e (training data synthesized
on-device); these tests load them on CPU and run the real stages.
"""
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SEP_CKPT = os.path.join(REPO, "models_ckpt", "separator")
HEAD_CKPT = os.path.join(REPO, "models_ckpt", "heading")
GNN_CKPT = os.path.join(REPO, "models_ckpt", "gnn", "best", "f1")


def _ckpt_exists(path):
    return os.path.isdir(path) and any(d.isdigit() for d in os.listdir(path))


@pytest.mark.skipif(not _ckpt_exists(SEP_CKPT), reason="no separator checkpoint")
def test_separator_stage_with_trained_model(tmp_path):
    import jax
    from PIL import Image
    from citlab_as_tpu.inference import SegmentationPredictor
    from citlab_as_tpu.pagexml import Page
    from citlab_as_tpu.stages.separator import SeparatorNetPostProcessor
    from citlab_as_tpu.train.synthetic_data import synthetic_batch

    img, lab = synthetic_batch(jax.random.PRNGKey(41), 1, 384, 384)
    img_np = (np.asarray(img)[0, :, :, 0] * 255).clip(0, 255).astype(np.uint8)
    Image.fromarray(img_np).save(tmp_path / "p.png")

    pred = SegmentationPredictor(SEP_CKPT, pad_multiple=32)
    proc = SeparatorNetPostProcessor(
        [str(tmp_path / "p.png")], pred, fixed_height=None,
        scaling_factor=1.0, threshold=0.3)
    proc.run()

    page = Page(str(tmp_path / "page" / "p.xml.xml"))
    seps = page.get_regions().get("SeparatorRegion", [])
    assert len(seps) >= 2
    orientations = {s.get_orientation() for s in seps}
    assert "vertical" in orientations or "horizontal" in orientations

    # detected separators overlap true separator pixels
    lab_np = np.asarray(lab)[0]
    true_sep = lab_np == 0
    hit = 0
    for s in seps:
        pts = s.points.points_list
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        crop = true_sep[max(min(ys) - 2, 0):max(ys) + 3,
                        max(min(xs) - 2, 0):max(xs) + 3]
        if crop.any():
            hit += 1
    assert hit >= len(seps) - 1  # nearly all detections are real


@pytest.mark.skipif(not _ckpt_exists(HEAD_CKPT), reason="no heading checkpoint")
def test_heading_predictor_quality_on_fresh_pages():
    import jax
    from citlab_as_tpu.inference import SegmentationPredictor
    from citlab_as_tpu.train.synthetic_data import synthetic_batch

    pred = SegmentationPredictor(HEAD_CKPT, pad_multiple=32)
    img, lab = synthetic_batch(jax.random.PRNGKey(77), 1, 256, 256,
                               heading_mode=True)
    probs = pred(np.asarray(img)[0, :, :, 0])
    pred_head = probs[..., 0] > 0.5
    target = np.asarray(lab)[0] == 0
    tp = (pred_head & target).sum()
    recall = tp / max(target.sum(), 1)
    precision = tp / max(pred_head.sum(), 1)
    assert recall > 0.8 and precision > 0.8


@pytest.mark.skipif(not _ckpt_exists(SEP_CKPT), reason="no separator checkpoint")
def test_predictor_quality_on_fresh_pages():
    import jax
    from citlab_as_tpu.inference import SegmentationPredictor
    from citlab_as_tpu.train.synthetic_data import synthetic_batch

    pred = SegmentationPredictor(SEP_CKPT, pad_multiple=32)
    img, lab = synthetic_batch(jax.random.PRNGKey(1234), 1, 256, 256)
    probs = pred(np.asarray(img)[0, :, :, 0])
    pred_sep = probs[..., 0] > 0.5
    target = np.asarray(lab)[0] == 0
    tp = (pred_sep & target).sum()
    recall = tp / max(target.sum(), 1)
    precision = tp / max(pred_sep.sum(), 1)
    assert recall > 0.8 and precision > 0.8


@pytest.mark.skipif(not os.path.isdir(GNN_CKPT), reason="no GNN checkpoint")
def test_gnn_checkpoint_clusters_synthetic_layouts():
    """Trained relation GNN + TextblockClustering recover the article
    partition of fresh synthetic multi-column layouts."""
    import sys
    sys.path.insert(0, REPO)
    from scripts.train_synthetic_gnn import synth_page_graph
    from citlab_as_tpu.inference import RelationPredictor
    from citlab_as_tpu.stages.clustering import TextblockClustering

    pred = RelationPredictor(GNN_CKPT)
    rng = np.random.RandomState(4321)
    agreements = []
    for _ in range(3):
        graph = None
        while graph is None:
            graph = synth_page_graph(rng)
        n = graph["num_nodes"]
        conf = pred(graph)
        tb = TextblockClustering()
        tb.set_confs(conf.tolist())
        tb.calc(method="dbscan")
        labels = tb.tb_labels

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for _, i, j in graph["gt_relations"]:
            a, b = find(i), find(j)
            if a != b:
                parent[a] = b
        gt_labels = [find(i) for i in range(n)]
        agree = sum((gt_labels[i] == gt_labels[j]) == (labels[i] == labels[j])
                    for i in range(n) for j in range(i + 1, n))
        agreements.append(agree / (n * (n - 1) / 2))
    assert np.mean(agreements) > 0.9


@pytest.mark.skipif(not os.path.isdir(GNN_CKPT), reason="no GNN checkpoint")
def test_full_workflow_with_trained_gnn(tmp_path):
    """Full five-stage workflow with the trained GNN loaded from its model
    dir (synthetic benign segmentation predictors stand in for the nets,
    whose synthetic training distribution doesn't cover this fixture)."""
    from citlab_as_tpu.cli.run_full_workflow import run_full_workflow
    from citlab_as_tpu.pagexml import Page
    from tests.test_cli import _page_with_lines

    def separator_predictor(image_grey):
        h, w = image_grey.shape
        prob = np.zeros((h, w, 2), np.float32)
        x = w // 2
        prob[10:h - 10, x - 2:x + 2, 0] = 0.9
        prob[..., 1] = 1.0 - prob[..., 0]
        return prob

    def heading_predictor(image_grey):
        h, w = image_grey.shape
        prob = np.zeros((h, w, 2), np.float32)
        prob[..., 1] = 1.0
        return prob

    img_path = _page_with_lines(tmp_path)
    result = run_full_workflow(
        [img_path], gnn_model_dir=GNN_CKPT, clustering_method="dbscan",
        out_dir=str(tmp_path / "out"),
        separator_predictor=separator_predictor,
        heading_predictor=heading_predictor)
    assert result["clustered"] and os.path.exists(result["clustered"][0])
    page = Page(result["clustered"][0])
    ids = {tl.get_article_id() for tl in page.get_textlines()}
    assert ids and None not in ids


@pytest.mark.skipif(not os.path.isdir(GNN_CKPT), reason="no GNN checkpoint")
def test_e2e_article_f1_against_ground_truth(tmp_path):
    """Workflow output vs GT through the AS measure: the trained GNN must
    recover the column-article partition of a full-size demo page
    (closes SURVEY §4's 'end-to-end article-F1 on a small corpus')."""
    import shutil
    import sys
    sys.path.insert(0, REPO)
    from scripts.bench_e2e import make_demo_page
    from citlab_as_tpu.cli.run_full_workflow import run_full_workflow
    from citlab_as_tpu.cli.run_measure import main as measure_main
    from citlab_as_tpu.pagexml import Page

    work = str(tmp_path)
    rng = np.random.RandomState(7)
    img, _ = make_demo_page(work, "d0", rng)
    page_path = os.path.join(work, "page", "d0.xml")

    # GT: one article per column
    gt_dir = os.path.join(work, "gt", "page")
    os.makedirs(gt_dir)
    gt_path = os.path.join(gt_dir, "d0.xml")
    shutil.copy(page_path, gt_path)
    page = Page(gt_path)
    tls = page.get_textlines()
    xs = sorted({tl.baseline.points_list[0][0] for tl in tls})
    for tl in tls:
        tl.set_article_id(f"a{xs.index(tl.baseline.points_list[0][0]) + 1}")
    page.set_textline_attr(tls)
    page.write_page_xml(gt_path)

    def benign(image_grey):
        h, w = image_grey.shape
        prob = np.zeros((h, w, 2), np.float32)
        prob[..., 1] = 1.0
        return prob

    result = run_full_workflow(
        [img], gnn_model_dir=GNN_CKPT, clustering_method="dbscan",
        out_dir=os.path.join(work, "out"),
        separator_predictor=benign, heading_predictor=benign)
    hyp_path = result["clustered"][0]
    assert os.path.exists(hyp_path)
    assert ".." not in os.path.relpath(hyp_path, work)  # stays in the tree

    gt_lst = os.path.join(work, "gt.lst")
    hy_lst = os.path.join(work, "hy.lst")
    open(gt_lst, "w").write(gt_path + "\n")
    open(hy_lst, "w").write(hyp_path + "\n")
    out = measure_main(["--path_to_gt_xml_lst", gt_lst,
                        "--path_to_hy_xml_lst", hy_lst,
                        "--min_tol", "10", "--max_tol", "30"])
    as_r, as_p, as_f = out["as"]
    # measured 1.0 on this clean corpus (PARITY.md quality table);
    # assert within ~2 points so silent regressions surface
    assert as_f > 0.98, f"AS F1 {as_f} too low (R={as_r}, P={as_p})"
    # split/merge partition distance (asCompTools.py semantics) on the
    # same GT/HYP pair: the clean-corpus partition must be near-exact
    from citlab_as_tpu.eval.compare import SepPageBlComper
    comper = SepPageBlComper()
    comper.loadGT(gt_path)
    comparison = comper.compareTo(hyp_path)
    assert comparison.checkConsistency()
    assert comparison.splits + comparison.merges <= 2, str(comparison)


@pytest.mark.skipif(
    not (_ckpt_exists(SEP_CKPT) and _ckpt_exists(HEAD_CKPT)
         and os.path.isdir(GNN_CKPT)),
    reason="needs all three checkpoints")
def test_e2e_all_trained_models_article_f1(tmp_path):
    """The COMPLETE pipeline with the three trained models (no injected
    predictors): separator ARU-Net -> heading net -> baseline clustering ->
    text regions -> GNN clustering, measured against GT with the AS
    measure. The separator net generalizes from its synthetic training
    pages to the demo-page distribution (bright bg / dark rules)."""
    import shutil
    import sys
    sys.path.insert(0, REPO)
    from scripts.bench_e2e import make_demo_page
    from citlab_as_tpu.cli.run_full_workflow import run_full_workflow
    from citlab_as_tpu.cli.run_measure import main as measure_main
    from citlab_as_tpu.pagexml import Page

    work = str(tmp_path)
    rng = np.random.RandomState(11)
    img, _ = make_demo_page(work, "d0", rng)
    page_path = os.path.join(work, "page", "d0.xml")
    gt_dir = os.path.join(work, "gt", "page")
    os.makedirs(gt_dir)
    gt_path = os.path.join(gt_dir, "d0.xml")
    shutil.copy(page_path, gt_path)
    page = Page(gt_path)
    tls = page.get_textlines()
    xs = sorted({tl.baseline.points_list[0][0] for tl in tls})
    for tl in tls:
        tl.set_article_id(f"a{xs.index(tl.baseline.points_list[0][0]) + 1}")
    page.set_textline_attr(tls)
    page.write_page_xml(gt_path)

    result = run_full_workflow(
        [img], separator_model_dir=SEP_CKPT, heading_model_dir=HEAD_CKPT,
        gnn_model_dir=GNN_CKPT, clustering_method="dbscan",
        out_dir=os.path.join(work, "out"))
    gt_lst = os.path.join(work, "gt.lst")
    hy_lst = os.path.join(work, "hy.lst")
    open(gt_lst, "w").write(gt_path + "\n")
    open(hy_lst, "w").write(result["clustered"][0] + "\n")
    out = measure_main(["--path_to_gt_xml_lst", gt_lst,
                        "--path_to_hy_xml_lst", hy_lst,
                        "--min_tol", "10", "--max_tol", "30"])
    as_r, as_p, as_f = out["as"]
    # measured 1.0 on clean corpora (PARITY.md quality table)
    assert as_f > 0.98, f"AS F1 {as_f} too low (R={as_r}, P={as_p})"


@pytest.mark.skipif(not _ckpt_exists(HEAD_CKPT), reason="no heading checkpoint")
def test_heading_stage_tags_demo_headings(tmp_path):
    """Trained heading net + SWT fusion tag exactly the heading lines of a
    demo page (tall thick strokes), no false positives on body lines."""
    from PIL import Image
    from citlab_as_tpu.inference import SegmentationPredictor
    from citlab_as_tpu.pagexml import Page
    from citlab_as_tpu.stages.heading import HeadingNetPostProcessor

    h, w = 1500, 1000
    img = np.full((h, w), 255, np.uint8)
    img[40:h - 40, 498:502] = 40
    for x0 in (30, 530):
        for x in range(x0, x0 + 380, 34):
            img[60:110, x:x + 16] = 0          # heading strokes
        for y in (170, 235, 300):
            for x in range(x0, x0 + 420, 22):
                img[y - 26:y - 2, x:x + 6] = 0  # body strokes
    Image.fromarray(img).save(tmp_path / "p.png")

    lines = []
    for i, (x0, x1) in enumerate(((30, 430), (530, 930))):
        lines.append(
            f'<TextLine id="tl_h{i}"><Coords points="{x0},55 {x1},55 '
            f'{x1},115 {x0},115"/><Baseline points="{x0},110 {x1},110"/>'
            f'<TextEquiv><Unicode>HEADING {i}</Unicode></TextEquiv></TextLine>')
        for y in (170, 235, 300):
            lines.append(
                f'<TextLine id="tl_{i}_{y}"><Coords points="{x0},{y - 28} '
                f'{x1},{y - 28} {x1},{y + 2} {x0},{y + 2}"/>'
                f'<Baseline points="{x0},{y} {x1},{y}"/>'
                f'<TextEquiv><Unicode>body</Unicode></TextEquiv></TextLine>')
    xml = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<PcGts xmlns="http://schema.primaresearch.org/PAGE/gts/'
        'pagecontent/2013-07-15">\n'
        '<Metadata><Creator>t</Creator><Created>x</Created>'
        '<LastChange>x</LastChange></Metadata>\n'
        f'<Page imageFilename="p.png" imageWidth="{w}" imageHeight="{h}">\n'
        '<TextRegion id="tr_1" type="paragraph">'
        f'<Coords points="10,30 990,30 990,1470 10,1470"/>\n'
        + "\n".join(lines) + '\n</TextRegion></Page></PcGts>')
    (tmp_path / "page").mkdir()
    (tmp_path / "page" / "p.xml").write_text(xml)

    pred = SegmentationPredictor(HEAD_CKPT, pad_multiple=32)
    HeadingNetPostProcessor([str(tmp_path / "p.png")], pred,
                            fixed_height=900).run()
    page = Page(str(tmp_path / "page" / "p.xml.xml"))
    tags = {tl.id: (tl.custom.get("structure") or {}).get("semantic_type")
            for tl in page.get_textlines()}
    assert tags["tl_h0"] == "heading" and tags["tl_h1"] == "heading"
    assert all(v is None for k, v in tags.items() if not k.startswith("tl_h"))


GNN_PIPE_CKPT = os.path.join(REPO, "models_ckpt", "gnn_pipeline", "best", "f1")


@pytest.mark.skipif(
    not (_ckpt_exists(SEP_CKPT) and _ckpt_exists(HEAD_CKPT)
         and os.path.isdir(GNN_PIPE_CKPT)),
    reason="needs all three checkpoints")
def test_blind_e2e_multi_article_f1(tmp_path):
    """The hardest committed-model test: a fresh page with multiple
    articles per column (horizontal rules + gaps), GT ids STRIPPED from
    the input; separator net + DBSCAN + pipeline-trained GNN must recover
    the partition blind. The GNN here was trained on features from the
    real pipeline (scripts/train_pipeline_gnn.py), with regions from the
    same blind DBSCAN path inference uses."""
    import shutil
    import sys
    sys.path.insert(0, REPO)
    from scripts.train_pipeline_gnn import make_article_page
    from citlab_as_tpu.cli.run_full_workflow import run_full_workflow
    from citlab_as_tpu.cli.run_measure import main as measure_main
    from citlab_as_tpu.pagexml import Page

    work = str(tmp_path)
    rng = np.random.RandomState(777)
    img, page_path, n_articles = make_article_page(work, "p", rng)
    assert n_articles >= 4  # multi-article page

    gt_dir = os.path.join(work, "gt", "page")
    os.makedirs(gt_dir)
    gt_path = os.path.join(gt_dir, "p.xml")
    shutil.copy(page_path, gt_path)

    page = Page(page_path)
    tls = page.get_textlines()
    for tl in tls:
        tl.set_article_id(None)
    page.set_textline_attr(tls)
    page.write_page_xml(page_path)

    result = run_full_workflow(
        [img], separator_model_dir=SEP_CKPT, heading_model_dir=HEAD_CKPT,
        gnn_model_dir=GNN_PIPE_CKPT, clustering_method="dbscan",
        out_dir=os.path.join(work, "out"))
    gt_lst = os.path.join(work, "gt.lst")
    hy_lst = os.path.join(work, "hy.lst")
    open(gt_lst, "w").write(gt_path + "\n")
    open(hy_lst, "w").write(result["clustered"][0] + "\n")
    out = measure_main(["--path_to_gt_xml_lst", gt_lst,
                        "--path_to_hy_xml_lst", hy_lst,
                        "--min_tol", "10", "--max_tol", "30"])
    as_r, as_p, as_f = out["as"]
    # measured 1.0 on clean corpora (PARITY.md quality table)
    assert as_f > 0.98, f"AS F1 {as_f} too low (R={as_r}, P={as_p})"


@pytest.mark.skipif(
    not (_ckpt_exists(SEP_CKPT) and _ckpt_exists(HEAD_CKPT)
         and os.path.isdir(GNN_PIPE_CKPT)),
    reason="needs all three checkpoints")
def test_blind_e2e_hard_corpus_f1(tmp_path):
    """Hard-corpus quality oracle (VERDICT weak #8): skewed (<=3 deg),
    noisy (5% salt/pepper + texture), dense pages whose separator rules are
    FADED below the separator net's detection point — article separation
    must come from layout gaps + the GNN. Measured AS F1 on this mode is
    ~0.99 (not saturated at 1.0 like the clean corpus); the threshold
    asserts the pipeline stays above 0.9."""
    import shutil
    import sys
    sys.path.insert(0, REPO)
    from scripts.hard_corpus import make_hard_article_page
    from citlab_as_tpu.cli.run_full_workflow import run_full_workflow
    from citlab_as_tpu.cli.run_measure import main as measure_main
    from citlab_as_tpu.pagexml import Page

    work = str(tmp_path)
    rng = np.random.RandomState(7)
    imgs, gts = [], []
    for i in range(2):
        img, page, n_articles, _ = make_hard_article_page(
            work, f"h{i}", rng, max_skew_deg=3.0, noise_frac=0.05,
            rule_grey=185)
        assert n_articles >= 4
        gt_dir = os.path.join(work, "gt", "page")
        os.makedirs(gt_dir, exist_ok=True)
        gt_path = os.path.join(gt_dir, f"h{i}.xml")
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
    # measured ~0.988 on the faded-rules corpus (PARITY.md quality table)
    assert as_f > 0.96, f"hard-corpus AS F1 {as_f} too low (R={as_r}, P={as_p})"


GNN_VISUAL_CKPT = os.path.join(REPO, "models_ckpt", "gnn_visual", "best", "f1")


@pytest.mark.skipif(
    not (_ckpt_exists(SEP_CKPT) and _ckpt_exists(HEAD_CKPT)
         and os.path.isdir(GNN_VISUAL_CKPT)),
    reason="needs separator/heading + visual GNN checkpoints")
def test_blind_e2e_visual_gnn_f1(tmp_path):
    """Blind e2e with the VISUAL 'v' relation net (image input through the
    ARU visual backbone, graph_relation.py:84-172 parity): fresh
    multi-article pages, GT ids stripped; RelationPredictor(image_input)
    through run_full_workflow (visual-region feature JSONs + page images
    reach the net).

    THREE pages (seeds 31/7/101) go through ONE workflow call and the
    measure averages over them: single-page AS F1 swings several points on
    one boundary line (both the r4 and r5 checkpoints scored 1.0 on some
    seeds and ~0.92 on others), so the quality floor is asserted on the
    mean — r5 retrain measured mean 0.97 over 5 seeds, min 0.92
    (ROUND5_NOTES.md) vs the r4 checkpoint's mean 0.93 / min 0.81."""
    import shutil
    import sys
    sys.path.insert(0, REPO)
    from scripts.train_pipeline_gnn import make_article_page
    from citlab_as_tpu.cli.run_full_workflow import run_full_workflow
    from citlab_as_tpu.cli.run_measure import main as measure_main
    from citlab_as_tpu.inference import RelationPredictor
    from citlab_as_tpu.pagexml import Page

    work = str(tmp_path)
    gt_dir = os.path.join(work, "gt", "page")
    os.makedirs(gt_dir)
    imgs, gt_paths = [], []
    for seed in (31, 7, 101):
        rng = np.random.RandomState(seed)
        img, page_path, n_articles = make_article_page(work, f"v{seed}", rng)
        assert n_articles >= 3
        gt_path = os.path.join(gt_dir, f"v{seed}.xml")
        shutil.copy(page_path, gt_path)
        page = Page(page_path)
        tls = page.get_textlines()
        for tl in tls:
            tl.set_article_id(None)
        page.set_textline_attr(tls)
        page.write_page_xml(page_path)
        imgs.append(img)
        gt_paths.append(gt_path)

    gnn = RelationPredictor(
        GNN_VISUAL_CKPT, image_input=True, visual_backbone="ARU_cutted_v1",
        image_min_dimension=288, image_max_dimension=384)
    result = run_full_workflow(
        imgs, separator_model_dir=SEP_CKPT, heading_model_dir=HEAD_CKPT,
        gnn_predictor=gnn, clustering_method="dbscan",
        out_dir=os.path.join(work, "out"))
    gt_lst = os.path.join(work, "gt.lst")
    hy_lst = os.path.join(work, "hy.lst")
    open(gt_lst, "w").write("\n".join(gt_paths) + "\n")
    open(hy_lst, "w").write("\n".join(result["clustered"]) + "\n")
    out = measure_main(["--path_to_gt_xml_lst", gt_lst,
                        "--path_to_hy_xml_lst", hy_lst,
                        "--min_tol", "10", "--max_tol", "30"])
    as_r, as_p, as_f = out["as"]
    assert as_f > 0.95, f"visual-GNN AS F1 {as_f} too low (R={as_r}, P={as_p})"

    # guard against a degenerate (constant-output) net passing vacuously on
    # pages whose DBSCAN regions are already article-pure: the confidence
    # matrix must discriminate (same-article pairs high, spread present)
    import glob
    import json as _json
    json_files = sorted(glob.glob(os.path.join(work, "json*", "*.json")))
    assert json_files, "feature JSONs missing"
    jf = next(p for p in json_files if "v31" in os.path.basename(p))
    with open(jf) as f:
        graph = _json.load(f)
    from citlab_as_tpu.utils.io import load_image
    confs = gnn.confidences(graph, image=np.asarray(
        load_image(imgs[0], mode="L")))
    n = int(graph["num_nodes"])
    off_diag = confs[~np.eye(n, dtype=bool)]
    # the collapsed round-1 net emitted a CONSTANT matrix (spread ~1e-8);
    # a healthy net discriminates even when every pair on this page is
    # genuinely cross-article (max conf can then be < 0.5 — correct)
    assert float(off_diag.max() - off_diag.min()) > 0.1, \
        f"confidences are near-constant (spread {off_diag.max() - off_diag.min():.3f})"
