"""Profiling utils + batched separator stage tests."""
import numpy as np
import pytest
from PIL import Image

from citlab_as_tpu.utils.profiling import StageTimer, annotate, profile_trace


def test_stage_timer():
    timer = StageTimer()
    with timer.section("a"):
        pass
    with timer.section("a"):
        pass
    with timer.section("b"):
        pass
    s = timer.summary()
    assert s["a"]["count"] == 2 and s["b"]["count"] == 1
    assert s["a"]["total_s"] >= 0
    timer.log_summary()  # no crash


def test_profile_trace_noop():
    with profile_trace(None):
        x = 1 + 1
    assert x == 2


def test_annotate():
    import jax.numpy as jnp
    with annotate("test_region"):
        y = jnp.ones(3).sum()
    assert float(y) == 3.0


def test_run_batched_matches_run(tmp_path):
    from citlab_as_tpu.pagexml import Page
    from citlab_as_tpu.stages.separator import SeparatorNetPostProcessor

    H, W = 128, 160
    for name in ("a", "b", "c"):
        Image.fromarray(np.full((H, W), 255, np.uint8)).save(tmp_path / f"{name}.png")

    def synthetic(h, w):
        prob = np.zeros((h, w, 2), np.float32)
        prob[h // 2:h // 2 + 3, 10:w - 10, 0] = 0.9
        prob[..., 1] = 1 - prob[..., 0]
        return prob

    class BatchPredictor:
        def __call__(self, grey):
            return synthetic(*grey.shape)

        def predict_batch(self, greys):
            return [synthetic(*g.shape) for g in greys]

    paths = [str(tmp_path / f"{n}.png") for n in ("a", "b", "c")]
    proc = SeparatorNetPostProcessor(paths, BatchPredictor(),
                                     fixed_height=None, scaling_factor=1.0)
    pages = proc.run_batched(batch_size=2)
    assert len(pages) == 3
    for name in ("a", "b", "c"):
        page = Page(str(tmp_path / "page" / f"{name}.xml.xml"))
        seps = page.get_regions().get("SeparatorRegion", [])
        assert len(seps) >= 1
