"""Blind e2e AS-F1 evaluation of a VISUAL relation-GNN checkpoint.

For each seed: render a fresh multi-article page (scripts/train_pipeline_gnn
.make_article_page), strip the GT article ids, run the FULL workflow with
the visual RelationPredictor (image input through the ARU_cutted backbone),
and score the clustering against GT with the AS measure — the same
protocol as tests/test_trained_models.py::test_blind_e2e_visual_gnn_f1,
over more seeds. Used to select/validate the exported checkpoint
(ROUND5_NOTES.md item 6; reference quality bar: nets/README.md:8-30).

Usage:
    python scripts/eval_visual_gnn.py [ckpt_dir] [--seeds 31,7,101,202,303]

Runs on the 8-virtual-device CPU mesh (no chip needed).
"""
import argparse
import os
import shutil
import sys
import tempfile

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", nargs="?", default=os.path.join(
        REPO, "models_ckpt", "gnn_visual", "best", "f1"))
    ap.add_argument("--seeds", default="31,7,101,202,303")
    ap.add_argument("--separator_model_dir", default=os.path.join(
        REPO, "models_ckpt", "separator"))
    ap.add_argument("--heading_model_dir", default=os.path.join(
        REPO, "models_ckpt", "heading"))
    ap.add_argument("--conf", type=float, default=None,
                    help="confidence_threshold override for the clustering")
    args = ap.parse_args()
    clustering_params = (
        {"confidence_threshold": args.conf} if args.conf is not None else None)

    from scripts.train_pipeline_gnn import make_article_page
    from citlab_as_tpu.cli.run_full_workflow import run_full_workflow
    from citlab_as_tpu.cli.run_measure import main as measure_main
    from citlab_as_tpu.inference import RelationPredictor
    from citlab_as_tpu.pagexml import Page

    gnn = RelationPredictor(args.ckpt, image_input=True,
                            visual_backbone="ARU_cutted_v1",
                            image_min_dimension=288, image_max_dimension=384)
    fs = []
    for seed in [int(s) for s in args.seeds.split(",")]:
        work = tempfile.mkdtemp(prefix=f"evalv_{seed}_")
        rng = np.random.RandomState(seed)
        img, page_path, n_articles = make_article_page(work, "v", rng)
        gt_dir = os.path.join(work, "gt", "page")
        os.makedirs(gt_dir)
        gt_path = os.path.join(gt_dir, "v.xml")
        shutil.copy(page_path, gt_path)
        page = Page(page_path)
        tls = page.get_textlines()
        for tl in tls:
            tl.set_article_id(None)
        page.set_textline_attr(tls)
        page.write_page_xml(page_path)
        result = run_full_workflow(
            [img], separator_model_dir=args.separator_model_dir,
            heading_model_dir=args.heading_model_dir, gnn_predictor=gnn,
            clustering_method="dbscan", out_dir=os.path.join(work, "out"),
            clustering_params=clustering_params)
        gt_lst = os.path.join(work, "gt.lst")
        hy_lst = os.path.join(work, "hy.lst")
        open(gt_lst, "w").write(gt_path + "\n")
        open(hy_lst, "w").write(result["clustered"][0] + "\n")
        out = measure_main(["--path_to_gt_xml_lst", gt_lst,
                            "--path_to_hy_xml_lst", hy_lst,
                            "--min_tol", "10", "--max_tol", "30"])
        as_r, as_p, as_f = out["as"]
        fs.append(as_f)
        print(f"seed {seed}: n_articles={n_articles} AS R={as_r:.4f} "
              f"P={as_p:.4f} F={as_f:.4f}", flush=True)
        shutil.rmtree(work, ignore_errors=True)
    print(f"CKPT={args.ckpt}")
    print(f"mean F={np.mean(fs):.4f} min F={np.min(fs):.4f}")
    return float(np.mean(fs))


if __name__ == "__main__":
    main()
