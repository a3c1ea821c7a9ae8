"""End-to-end pipeline benchmark: all five stages over realistic-size pages.

Complements bench.py (which measures the dominant-FLOPs ARU-Net forward on
the real chip): this times the WHOLE workflow — separator net, heading net,
DBSCAN baseline clustering, text-region generation, GNN feature build,
relation GNN + clustering, PAGE-XML IO — per stage, on full-size
(1500 x 1000 px, ~40-line) synthetic newspaper pages.

Under the axon tunnel, host->device image transfer (~1 MB/s) would dominate
and misrepresent the design, so by default this runs the nets on CPU and
reports per-stage seconds/page; combine with bench.py's TPU forward time
for the production estimate (the nets are the only device stages).

    python scripts/bench_e2e.py [--pages 4] [--platform cpu]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_demo_page(out_dir: str, name: str, rng: np.random.RandomState,
                   w: int = 1000, h: int = 1500):
    """Full-size two/three-column page: image (text strokes + dark column
    separators) and PAGE-XML with baselines."""
    from PIL import Image

    n_cols = rng.randint(2, 4)
    col_w = w // n_cols
    img = np.full((h, w), 255, np.uint8)
    # vertical separator rules between columns
    for c in range(1, n_cols):
        x = c * col_w
        img[40:h - 40, x - 2:x + 2] = 40

    lines = []
    i = 0
    for c in range(n_cols):
        x0, x1 = c * col_w + 30, (c + 1) * col_w - 30
        y = 80
        while y < h - 60:
            # text strokes
            for x in range(x0, x1 - 8, 22):
                img[y - 26:y - 2, x:x + 6] = 0
            lines.append(
                f'<TextLine id="tl_{i}">\n'
                f'  <Coords points="{x0},{y - 30} {x1},{y - 30} '
                f'{x1},{y + 4} {x0},{y + 4}"/>\n'
                f'  <Baseline points="{x0},{y} {x1},{y}"/>\n'
                f'  <TextEquiv><Unicode>demo line {i}</Unicode></TextEquiv>\n'
                f'</TextLine>')
            i += 1
            y += int(rng.uniform(55, 75))

    Image.fromarray(img).save(os.path.join(out_dir, f"{name}.png"))
    xml = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<PcGts xmlns="http://schema.primaresearch.org/PAGE/gts/'
        'pagecontent/2013-07-15">\n'
        '  <Metadata><Creator>bench</Creator><Created>x</Created>'
        '<LastChange>x</LastChange></Metadata>\n'
        f'  <Page imageFilename="{name}.png" imageWidth="{w}" '
        f'imageHeight="{h}">\n'
        '    <TextRegion id="tr_1" type="paragraph">\n'
        f'      <Coords points="10,30 {w - 10},30 {w - 10},{h - 30} '
        f'10,{h - 30}"/>\n'
        + "\n".join(lines) +
        '\n    </TextRegion>\n  </Page>\n</PcGts>\n')
    page_dir = os.path.join(out_dir, "page")
    os.makedirs(page_dir, exist_ok=True)
    with open(os.path.join(page_dir, f"{name}.xml"), "w") as f:
        f.write(xml)
    return os.path.join(out_dir, f"{name}.png"), i


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--pages", type=int, default=4)
    parser.add_argument("--platform", type=str, default="cpu")
    parser.add_argument("--work_dir", type=str, default="/tmp/bench_e2e")
    parser.add_argument("--separator_model_dir", type=str,
                        default="models_ckpt/separator")
    parser.add_argument("--heading_model_dir", type=str,
                        default="models_ckpt/heading")
    parser.add_argument("--gnn_model_dir", type=str,
                        default="models_ckpt/gnn/best/f1")
    args = parser.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from citlab_as_tpu.cli.run_full_workflow import run_full_workflow

    os.makedirs(args.work_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    # warm pages are DISTINCT from timed pages so per-page caches (the SWT
    # distance-transform memo, the scoped page parse cache) stay cold for the
    # timed run — same methodology as the top-level bench.py
    warm_paths, image_paths, total_lines = [], [], 0
    for i in range(args.pages):
        path, _ = make_demo_page(args.work_dir, f"warm{i:03d}", rng)
        warm_paths.append(path)
    for i in range(args.pages):
        path, n_lines = make_demo_page(args.work_dir, f"bench{i:03d}", rng)
        image_paths.append(path)
        total_lines += n_lines

    def model_dir_or_none(d):
        return d if os.path.isdir(d) else None

    # build the predictors ONCE (as a long-running service would) so the
    # warm-up run actually warms their jit caches
    from citlab_as_tpu.inference import RelationPredictor, SegmentationPredictor
    sep_pred = SegmentationPredictor(model_dir_or_none(args.separator_model_dir))
    head_pred = SegmentationPredictor(model_dir_or_none(args.heading_model_dir))
    gnn_pred = RelationPredictor(model_dir_or_none(args.gnn_model_dir))

    # warm-up over a page set with the same batch structure so the timed run
    # hits the fused per-batch-shape jit caches (a 1-page warm-up would
    # compile different programs than the batched run)
    run_full_workflow(
        warm_paths, out_dir=os.path.join(args.work_dir, "warm"),
        separator_predictor=sep_pred, heading_predictor=head_pred,
        gnn_predictor=gnn_pred)

    timings = {}
    t0 = time.perf_counter()
    result = run_full_workflow(
        image_paths, out_dir=os.path.join(args.work_dir, "out"),
        separator_predictor=sep_pred, heading_predictor=head_pred,
        gnn_predictor=gnn_pred, timings=timings)
    total = time.perf_counter() - t0

    n = len(image_paths)
    report = {
        "metric": f"e2e workflow pages/s ({args.platform or 'default backend'}, "
                  f"{n} pages, ~{total_lines // n} lines/page)",
        "value": round(n / total, 3),
        "unit": "pages/s",
        "stage_s_per_page": {k: round(v / n, 3)
                             for k, v in sorted(timings.items())},
        "pages_out": len(result["pages"]),
    }
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
