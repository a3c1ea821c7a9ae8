"""Per-page fault isolation in the workflow drivers (utils/faults.py).

Reference contract: one failing page is logged and skipped, never fatal to
the batch (run_baseline_clustering.py:39-42 ``skipped_files``,
feature_generation.py:855-911 ``skipped_pages``). Round-4 verdict item 2:
the pipelined driver's wave loops propagated any per-page exception and
killed the whole batch. These tests feed a batch containing one corrupt
PAGE-XML and one truncated image and assert the other pages still come out
correct — through BOTH drivers.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from citlab_as_tpu.utils.faults import SkippedPages, page_guard


def test_skipped_pages_registry():
    reg = SkippedPages()
    assert len(reg) == 0 and "x" not in reg
    reg.record("x", "separator", ValueError("bad"))
    reg.record("x", "heading", ValueError("later"))   # dedup: first stage wins
    reg.record("y", "load", OSError("truncated"))
    assert "x" in reg and "y" in reg and len(reg) == 2
    entries = reg.as_list()
    assert entries[0] == {"page": "x", "stage": "separator",
                          "error": "ValueError: bad"}
    assert entries[1]["stage"] == "load"
    # guard: exception -> recorded + default, success -> value through
    assert reg.guard("z", "textregion", lambda: 1 / 0, default=-1) == -1
    assert "z" in reg
    assert reg.guard("w", "textregion", lambda: 42) == 42
    assert "w" not in reg


def test_page_guard_raises_without_hook():
    with pytest.raises(ZeroDivisionError):
        page_guard(None, "p", "stage", lambda: 1 / 0)
    calls = []
    out = page_guard(lambda *a: calls.append(a), "p", "stage",
                     lambda: 1 / 0, default="d")
    assert out == "d" and calls[0][:2] == ("p", "stage")


def _make_corpus(tmp_path, n=5):
    from bench_e2e import make_demo_page
    rng = np.random.RandomState(3)
    return [make_demo_page(str(tmp_path), f"p{i}", rng, w=500, h=700)[0]
            for i in range(n)]


def _break_pages(tmp_path, image_paths):
    """Corrupt page 1's PAGE-XML and truncate page 2's image."""
    from citlab_as_tpu.utils.io import get_page_path
    corrupt_xml_img = image_paths[1]
    with open(get_page_path(corrupt_xml_img), "w") as f:
        f.write("<PcGts><Unclosed garbage &&& ")
    truncated_img = image_paths[2]
    with open(truncated_img, "rb") as f:
        head = f.read(256)
    with open(truncated_img, "wb") as f:
        f.write(head)
    return corrupt_xml_img, truncated_img


def _predictors():
    from citlab_as_tpu.inference import RelationPredictor, SegmentationPredictor
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def ckpt(name):
        d = os.path.join(repo, "models_ckpt", name)
        return d if os.path.isdir(d) else None

    return (SegmentationPredictor(ckpt("separator")),
            SegmentationPredictor(ckpt("heading")),
            RelationPredictor(ckpt(os.path.join("gnn", "best", "f1"))))


def _assert_survivors_ok(result, image_paths, corrupt_xml_img, truncated_img,
                         out_dir):
    from citlab_as_tpu.pagexml import Page
    skipped = {e["page"]: e for e in result["skipped"]}
    assert truncated_img in skipped
    assert skipped[truncated_img]["stage"] == "load"
    assert corrupt_xml_img in skipped
    survivors = [p for p in image_paths
                 if p not in (corrupt_xml_img, truncated_img)]
    assert len(result["clustered"]) == len(survivors)
    for img in survivors:
        from citlab_as_tpu.utils.io import get_page_path
        out_page = get_page_path(img) + ".xml"
        assert os.path.exists(out_page)
        page = Page(out_page)
        assert page.get_text_regions()
        assert all(tl.get_article_id() for tl in page.get_textlines())
    for path in result["clustered"]:
        assert os.path.exists(path)


def test_pipelined_driver_isolates_faults(tmp_path):
    """The wave loops (force=True: fused dispatch/drain on the CPU backend,
    production shape) survive one corrupt XML + one truncated image in the
    SAME batch and still produce correct output for the other pages."""
    from citlab_as_tpu.cli.run_full_workflow import run_full_workflow_pipelined

    image_paths = _make_corpus(tmp_path)
    corrupt_xml_img, truncated_img = _break_pages(tmp_path, image_paths)
    sep, head, gnn = _predictors()

    result = run_full_workflow_pipelined(
        image_paths, out_dir=str(tmp_path / "out"),
        separator_predictor=sep, heading_predictor=head, gnn_predictor=gnn,
        force=True, batch_size=2,
        separator_fixed_height=512, heading_fixed_height=384)
    _assert_survivors_ok(result, image_paths, corrupt_xml_img, truncated_img,
                         tmp_path / "out")


def test_sequential_driver_isolates_faults(tmp_path):
    from citlab_as_tpu.cli.run_full_workflow import run_full_workflow

    image_paths = _make_corpus(tmp_path)
    corrupt_xml_img, truncated_img = _break_pages(tmp_path, image_paths)
    sep, head, gnn = _predictors()

    result = run_full_workflow(
        image_paths, out_dir=str(tmp_path / "out"),
        separator_predictor=sep, heading_predictor=head, gnn_predictor=gnn,
        batch_size=2,
        separator_fixed_height=512, heading_fixed_height=384)
    _assert_survivors_ok(result, image_paths, corrupt_xml_img, truncated_img,
                         tmp_path / "out")


def test_fault_tolerant_off_raises(tmp_path):
    """fault_tolerant=False restores raise-through (debugging contract)."""
    from citlab_as_tpu.cli.run_full_workflow import run_full_workflow

    image_paths = _make_corpus(tmp_path, n=2)
    _break_pages(tmp_path, image_paths + [image_paths[1]])  # corrupt p1 xml
    sep, head, gnn = _predictors()
    with pytest.raises(Exception):
        run_full_workflow(
            image_paths, out_dir=str(tmp_path / "out"),
            separator_predictor=sep, heading_predictor=head,
            gnn_predictor=gnn, batch_size=2, fault_tolerant=False,
            separator_fixed_height=512, heading_fixed_height=384)


def test_pipelined_driver_isolates_faults_with_mesh(tmp_path):
    """Broken batch through the DATA-PARALLEL mesh driver: a skipped page
    shrinks its group below batch_size*n_data, and the driver must still
    pad the device batch to the full shard layout (run_full_workflow.py
    pads by repeating the last image before shard_batch) while the skip
    list stays correct — the v5e-8 inference shape with faults."""
    from citlab_as_tpu.cli.run_full_workflow import run_full_workflow_pipelined
    from citlab_as_tpu.parallel.mesh import make_mesh

    image_paths = _make_corpus(tmp_path)
    corrupt_xml_img, truncated_img = _break_pages(tmp_path, image_paths)
    sep, head, gnn = _predictors()

    result = run_full_workflow_pipelined(
        image_paths, out_dir=str(tmp_path / "out"),
        separator_predictor=sep, heading_predictor=head, gnn_predictor=gnn,
        force=True, batch_size=1, mesh=make_mesh(), host_workers=2,
        separator_fixed_height=512, heading_fixed_height=384)
    _assert_survivors_ok(result, image_paths, corrupt_xml_img, truncated_img,
                         tmp_path / "out")


def test_pipelined_driver_isolates_faults_with_pool(tmp_path):
    """Same broken batch through the pooled host tail (host_workers=2,
    stages/host_chain.py): pages skipped upstream must never reach the
    worker pool, and the survivors' outputs stay correct. (The pool's own
    per-item skip contract is unit-tested in test_workers.py.)"""
    from citlab_as_tpu.cli.run_full_workflow import run_full_workflow_pipelined

    image_paths = _make_corpus(tmp_path)
    corrupt_xml_img, truncated_img = _break_pages(tmp_path, image_paths)
    sep, head, gnn = _predictors()

    result = run_full_workflow_pipelined(
        image_paths, out_dir=str(tmp_path / "out"),
        separator_predictor=sep, heading_predictor=head, gnn_predictor=gnn,
        force=True, batch_size=2, host_workers=2,
        separator_fixed_height=512, heading_fixed_height=384)
    _assert_survivors_ok(result, image_paths, corrupt_xml_img, truncated_img,
                         tmp_path / "out")
