"""Host-process fan-out (utils/workers.py) + CLI --num_workers."""
import functools
import os

import numpy as np

from citlab_as_tpu.utils.workers import run_sharded

from tests.test_cli import _page_with_lines


def _double_builder():
    return lambda x: x * 2


def _failing_builder():
    def fn(x):
        if x == 3:
            raise ValueError("boom")
        return x + 1
    return fn


def test_run_sharded_in_process():
    results, skipped = run_sharded(_double_builder, [1, 2, 3], num_workers=0)
    assert dict(results) == {1: 2, 2: 4, 3: 6}
    assert skipped == []


def test_run_sharded_skips_failures():
    results, skipped = run_sharded(_failing_builder, [1, 2, 3, 4], num_workers=0)
    assert dict(results) == {1: 2, 2: 3, 4: 5}
    assert skipped == [3]


def test_run_sharded_process_pool():
    results, skipped = run_sharded(_double_builder, list(range(10)),
                                   num_workers=2)
    assert dict(results) == {i: i * 2 for i in range(10)}
    assert skipped == []


def test_baseline_clustering_cli_workers(tmp_path):
    from citlab_as_tpu.cli.run_baseline_clustering import main
    from citlab_as_tpu.pagexml import Page

    paths = []
    for i in range(3):
        _page_with_lines(tmp_path, name=f"w{i}")
        paths.append(str(tmp_path / "page" / f"w{i}.xml"))
    lst = tmp_path / "pages.lst"
    lst.write_text("\n".join(paths) + "\n")
    main(["--path_to_xml_lst", str(lst), "--num_workers", "2"])
    for path in paths:
        page = Page(path)
        assert all(tl.get_article_id() for tl in page.get_textlines())


def test_feature_generation_cli_workers(tmp_path):
    from citlab_as_tpu.cli.run_baseline_clustering import main as cluster_main
    from citlab_as_tpu.cli.run_feature_generation import main as feat_main
    from citlab_as_tpu.cli.run_textregion_generation import main as region_main

    paths = []
    for i in range(2):
        _page_with_lines(tmp_path, name=f"f{i}")
        paths.append(str(tmp_path / "page" / f"f{i}.xml"))
    lst = tmp_path / "pages.lst"
    lst.write_text("\n".join(paths) + "\n")
    cluster_main(["--path_to_xml_lst", str(lst), "--num_workers", "2"])
    region_main(["--path_to_xml_lst", str(lst), "--num_workers", "2"])
    out_dir = str(tmp_path / "json_out")
    feat_main(["--pagexml_list", str(lst), "--out_path", out_dir,
               "--num_workers", "2"])
    assert len(os.listdir(out_dir)) == 2


def test_net_post_processing_cli_batched_sharded(tmp_path):
    """Separator CLI with --batch_size and --sharded: batched mesh
    inference through the full stage, output pages written."""
    from citlab_as_tpu.cli.run_net_post_processing import main

    paths = []
    for i in range(3):
        paths.append(_page_with_lines(tmp_path, name=f"b{i}"))
    lst = tmp_path / "imgs.lst"
    lst.write_text("\n".join(paths) + "\n")
    main(["--path_to_image_list", str(lst), "--mode", "separator",
          "--fixed_height", "128", "--batch_size", "2", "--sharded"])
    for i in range(3):
        assert os.path.exists(tmp_path / "page" / f"b{i}.xml.xml")


def _square_builder():
    return lambda x: x * x


def test_persistent_pool_survives_calls():
    """PersistentPool: same workers serve several map_items waves (no
    re-spawn per wave), log-and-skip per item."""
    from citlab_as_tpu.utils.workers import PersistentPool

    with PersistentPool(_square_builder, num_workers=2) as pool:
        r1, s1 = pool.map_items([1, 2, 3])
        assert sorted(v for _, v in r1) == [1, 4, 9] and not s1
        # second wave reuses the live workers
        r2, s2 = pool.map_items([4, 5])
        assert sorted(v for _, v in r2) == [16, 25] and not s2
        assert pool.map_items([]) == ([], [])


def _fail_odd_builder():
    def fn(x):
        if x % 2:
            raise ValueError(x)
        return x
    return fn


def test_persistent_pool_skip_contract():
    from citlab_as_tpu.utils.workers import PersistentPool

    with PersistentPool(_fail_odd_builder, num_workers=2) as pool:
        results, skipped = pool.map_items([0, 1, 2, 3])
        assert sorted(v for _, v in results) == [0, 2]
        assert sorted(skipped) == [1, 3]
