"""PAGE-XML visualization (reference: python_util/parser/xml/page/plot.py).

Matplotlib page viewer: page image + baselines/surrounding polygons colored
per article, region outlines (optionally filled) per region type, article
color legend; batch helpers over lists/folders. Uses the Agg backend when no
display is available; ``save_path`` renders to file instead of showing.
"""
from __future__ import annotations

import os
import re
from typing import Dict, List, Optional, Sequence

import matplotlib

if not os.environ.get("DISPLAY"):
    matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
from matplotlib.collections import PolyCollection

from citlab_as_tpu.pagexml.page import Page
from citlab_as_tpu.utils.colors import COLORS, DEFAULT_COLOR
from citlab_as_tpu.utils.io import load_image

REGION_COLORS = {
    "TextRegion": "tab:blue",
    "SeparatorRegion": "tab:red",
    "ImageRegion": "tab:green",
    "GraphicRegion": "tab:olive",
    "TableRegion": "tab:purple",
    "AdvertRegion": "tab:orange",
    "NoiseRegion": "tab:gray",
    "UnknownRegion": "tab:brown",
}


def compare_article_ids(a: Optional[str], b: Optional[str]) -> int:
    """Sort key comparator for article ids ('a1' < 'a2' < ... < None)."""
    if a == b:
        return 0
    if a is None:
        return 1
    if b is None:
        return -1
    na = re.sub(r"\D", "", a)
    nb = re.sub(r"\D", "", b)
    if na and nb and na != nb:
        return -1 if int(na) < int(nb) else 1
    return -1 if a < b else 1


def article_color_map(article_ids: Sequence[Optional[str]]) -> Dict[Optional[str], str]:
    """Stable article-id -> color assignment (None = default color)."""
    import functools
    unique = sorted({a for a in article_ids},
                    key=functools.cmp_to_key(compare_article_ids))
    colors = {}
    idx = 0
    for a in unique:
        if a is None:
            colors[a] = DEFAULT_COLOR
        else:
            colors[a] = COLORS[idx % len(COLORS)]
            idx += 1
    return colors


def add_image(axes, path: str):
    """Show the page image as the plot background (plot.py:68-85)."""
    img = load_image(path, mode="L")
    axes.imshow(img, cmap="gray")
    return img


def add_polygons(axes, poly_list, color=DEFAULT_COLOR, closed=False,
                 linewidth=1.2, alpha=1.0, filled=False):
    """Add a list of [(x, y), ...] polygons to the axes (plot.py:88-104)."""
    polys = [np.asarray(p, dtype=np.float64) for p in poly_list if len(p) >= 2]
    if not polys:
        return None
    collection = PolyCollection(
        polys, closed=closed, edgecolors=color,
        facecolors=color if filled else "none",
        linewidths=linewidth, alpha=alpha)
    axes.add_collection(collection)
    return collection


def plot_ax(ax=None, img_path: str = "", baselines_list=None, surr_polys=None,
            bcolors=None, region_dict_poly=None, fill_regions: bool = False,
            plot_legend: bool = False, legend_map=None):
    """Compose one page plot from pre-extracted geometry (plot.py:224-313)."""
    if ax is None:
        _, ax = plt.subplots(figsize=(12, 16))
    ax.set_aspect("equal")
    ax.invert_yaxis()
    if img_path:
        add_image(ax, img_path)

    if baselines_list:
        bcolors = bcolors or [DEFAULT_COLOR] * len(baselines_list)
        for baseline, color in zip(baselines_list, bcolors):
            add_polygons(ax, [baseline], color=color, linewidth=1.8)
    if surr_polys:
        bcolors = bcolors or [DEFAULT_COLOR] * len(surr_polys)
        for poly, color in zip(surr_polys, bcolors):
            add_polygons(ax, [poly], color=color, closed=True, alpha=0.7)
    if region_dict_poly:
        for region_name, polys in region_dict_poly.items():
            color = REGION_COLORS.get(region_name, "tab:cyan")
            add_polygons(ax, polys, color=color, closed=True,
                         alpha=0.3 if fill_regions else 0.9,
                         filled=fill_regions)
    if plot_legend and legend_map:
        handles = [plt.Line2D([0], [0], color=c, lw=2, label=str(a))
                   for a, c in legend_map.items()]
        ax.legend(handles=handles, loc="upper right", fontsize=7)
    return ax


def plot_pagexml(page, path_to_img: str = "", ax=None, plot_article: bool = True,
                 plot_legend: bool = False, fill_regions: bool = False,
                 use_page_image_resolution: bool = False,
                 save_path: Optional[str] = None):
    """Plot a PAGE-XML file or Page object (plot.py:316-404): baselines
    colored per article, region outlines, optional legend."""
    if not isinstance(page, Page):
        page = Page(page)

    textlines = page.get_textlines()
    baselines, article_ids = [], []
    for tl in textlines:
        if tl.baseline is None:
            continue
        baselines.append(tl.baseline.points_list)
        article_ids.append(tl.get_article_id() if plot_article else None)

    color_map = article_color_map(article_ids)
    bcolors = [color_map[a] for a in article_ids]

    region_dict_poly = {
        name: [r.points.points_list for r in regions]
        for name, regions in page.get_regions().items()}

    ax = plot_ax(ax=ax, img_path=path_to_img, baselines_list=baselines,
                 bcolors=bcolors, region_dict_poly=region_dict_poly,
                 fill_regions=fill_regions, plot_legend=plot_legend,
                 legend_map=color_map if plot_article else None)
    if use_page_image_resolution:
        w, h = page.get_image_resolution()
        ax.set_xlim(0, w)
        ax.set_ylim(h, 0)
    if save_path:
        ax.figure.savefig(save_path, bbox_inches="tight", dpi=150)
        plt.close(ax.figure)
    return ax


def plot_list(img_lst: Sequence[str], hyp_lst: Sequence[str],
              gt_lst: Optional[Sequence[str]] = None, plot_article=True,
              plot_legend=False, out_dir: Optional[str] = None) -> List[str]:
    """Plot hypothesis (and optional GT side-by-side) pages for a list of
    images (plot.py:407-531); returns saved paths when out_dir is given."""
    saved = []
    for i, (img_path, hyp_path) in enumerate(zip(img_lst, hyp_lst)):
        if gt_lst is not None:
            fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(24, 16))
            plot_pagexml(hyp_path, img_path, ax=ax1, plot_article=plot_article,
                         plot_legend=plot_legend)
            ax1.set_title("HYP")
            plot_pagexml(gt_lst[i], img_path, ax=ax2, plot_article=plot_article,
                         plot_legend=plot_legend)
            ax2.set_title("GT")
        else:
            fig = None
            ax = plot_pagexml(hyp_path, img_path, plot_article=plot_article,
                              plot_legend=plot_legend)
            fig = ax.figure
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            name = os.path.splitext(os.path.basename(img_path))[0] + ".png"
            path = os.path.join(out_dir, name)
            fig.savefig(path, bbox_inches="tight", dpi=120)
            plt.close(fig)
            saved.append(path)
    return saved


def plot_folder(path_to_folder: str, plot_article=True, plot_legend=False,
                out_dir: Optional[str] = None) -> List[str]:
    """Plot every image with its page/<name>.xml in a folder (plot.py:534+)."""
    from citlab_as_tpu.utils.io import get_page_path
    imgs = sorted(
        os.path.join(path_to_folder, f) for f in os.listdir(path_to_folder)
        if f.lower().endswith((".png", ".jpg", ".tif", ".jpeg")))
    hyps = [get_page_path(i) for i in imgs]
    pairs = [(i, h) for i, h in zip(imgs, hyps) if os.path.exists(h)]
    if not pairs:
        return []
    imgs, hyps = zip(*pairs)
    return plot_list(list(imgs), list(hyps), plot_article=plot_article,
                     plot_legend=plot_legend, out_dir=out_dir)
