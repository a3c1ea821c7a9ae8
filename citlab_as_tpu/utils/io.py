"""File/path helpers preserving the reference's on-disk layout contract
(python_util/io/{file_loader,path_util}.py): images live next to a ``page/``
folder holding ``<name>.xml``; graph features in ``json*/<name>.json``;
confidences in ``confidences/<name>_confidences.json``.
"""
from __future__ import annotations

import glob
import os
import re
from typing import List

import numpy as np

_IMG_ENDINGS = ("tif", "jpg", "png")


def load_text_file(filename: str) -> List[str]:
    out = []
    with open(filename, "r") as f:
        for line in f:
            out.append(line if line == "\n" else line.strip())
    return out


def load_list_file(path_to_list: str) -> List[str]:
    with open(path_to_list, "r") as f:
        return [line.rstrip() for line in f.readlines()]


def get_page_path(image_path: str, page_folder_name: str = "page",
                  append_extension: bool = False) -> str:
    """Image path -> sibling ``page/<name>.xml`` (file_loader.py:23-36)."""
    dir_name = os.path.dirname(image_path)
    image_name = os.path.basename(image_path)
    if append_extension:
        return os.path.join(dir_name, page_folder_name, image_name + ".xml")
    return os.path.join(dir_name, page_folder_name, os.path.splitext(image_name)[0] + ".xml")


_IMAGE_CACHE: "dict" = {}
_IMAGE_CACHE_MAX = 16


def load_image(path_to_image: str, mode: str = "L") -> np.ndarray:
    """Load an image as a numpy array (grayscale 'L' or RGB).

    Bounded mtime-keyed LRU: in one workflow pass the separator, heading,
    feature and GNN stages each load the same page image (PNG decode is
    10-20 ms/page of pure host time on the single-core production host);
    the second and later loads are free. Results are read-only views."""
    from PIL import Image
    key = (os.path.abspath(path_to_image), mode)
    try:
        mtime = os.path.getmtime(path_to_image)
    except OSError:
        mtime = None
    entry = _IMAGE_CACHE.get(key)
    if entry is not None and entry[0] == mtime:
        _IMAGE_CACHE[key] = _IMAGE_CACHE.pop(key)   # LRU bump
        return entry[1]
    arr = np.asarray(Image.open(path_to_image).convert(mode))
    arr.flags.writeable = False
    _IMAGE_CACHE[key] = (mtime, arr)
    while len(_IMAGE_CACHE) > _IMAGE_CACHE_MAX:
        _IMAGE_CACHE.pop(next(iter(_IMAGE_CACHE)))
    return arr


def get_img_from_page_path(page_path: str) -> str:
    """page/<name>.xml -> the sibling image file (path_util.py:15-31)."""
    base = re.sub(r"/page/([-\w.]+)\.xml$", r"/\1", page_path)
    if base.endswith(_IMG_ENDINGS) and os.path.isfile(base):
        return base
    for ending in _IMG_ENDINGS:
        candidate = re.sub(r"/page/([-\w.]+)\.xml$", r"/\1." + ending, page_path)
        if os.path.isfile(candidate):
            return candidate
    raise IOError(f"No image file (tif, png, jpg) found for page xml {page_path}")


def get_img_from_json_path(json_path: str) -> str:
    base = re.sub(r"/json\w*/([-\w.]+)\.json$", r"/\1", json_path)
    if base.endswith(_IMG_ENDINGS) and os.path.isfile(base):
        return base
    stems = [base]
    if base.endswith(".xml"):     # jsons named <page>.xml.json
        stems.append(base[:-4])
    for stem in stems:
        for ending in _IMG_ENDINGS:
            candidate = f"{stem}.{ending}"
            if os.path.isfile(candidate):
                return candidate
    raise IOError(f"No image file (tif, png, jpg) found for json {json_path}")


def get_page_from_img_path(img_path: str) -> str:
    page_path = re.sub(r"/([-\w.]+)$", r"/page/\1.xml", img_path)
    if os.path.isfile(page_path):
        return page_path
    page_path = re.sub(r"/([-\w.]+)\.\w+$", r"/page/\1.xml", img_path)
    if not os.path.isfile(page_path):
        raise IOError(f"No page xml found for image {img_path}")
    return page_path


def get_page_from_json_path(json_path: str) -> str:
    page_path = re.sub(r"/json\w*/([-\w.]+)$", r"/page/\1.xml", json_path)
    if os.path.isfile(page_path):
        return page_path
    page_path = re.sub(r"/json\w*/([-\w.]+)\.json$", r"/page/\1.xml", json_path)
    if not os.path.isfile(page_path):
        raise IOError(f"No page xml found for json {json_path}")
    return page_path


def get_page_from_conf_path(conf_path: str) -> str:
    page_path = re.sub(r"/confidences/([-\w.]+)_confidences\.json$", r"/page/\1.xml", conf_path)
    if not os.path.isfile(page_path):
        raise IOError(f"No page xml found for confidence json {conf_path}")
    return page_path


def get_path_from_exportdir(model_dir: str, pattern: str, not_pattern: str) -> str:
    """Find the single exported model file matching ``pattern`` in
    <model_dir>/export (path_util.py:6-12)."""
    export_dir = os.path.join(model_dir, "export")
    names = [x for x in glob.glob1(export_dir, pattern) if not_pattern not in x]
    if len(names) != 1:
        raise IOError(
            f"Found {len(names)} '{pattern}' files in {export_dir}, there must be exactly one.")
    return os.path.join(export_dir, names[0])


def prepend_folder_name(file_path: str) -> str:
    folder_path = os.path.dirname(file_path)
    return os.path.join(
        folder_path, os.path.basename(folder_path) + "_" + os.path.basename(file_path))
