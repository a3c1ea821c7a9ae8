"""Evaluation package tests: AS measure, split/merge comparator, checker, xlsx."""
import os
import zipfile

import numpy as np
import pytest

from citlab_as_tpu.eval.checker import AsChecker, AsProbCode
from citlab_as_tpu.eval.compare import (
    CompDictEvaler, SepPageBlComper, SepPageCompDict, SepPageComparison,
    SeparatedPage,
)
from citlab_as_tpu.eval.measure import (
    BaselineMeasureEval, get_data_from_pagexml, get_greedy_sum, run_eval,
    run_measure,
)
from citlab_as_tpu.geometry.polygon import Polygon


def _page_xml(lines, w=1000, h=1200, img="p.png"):
    body = []
    body.append('<TextRegion id="tr_1" type="paragraph">')
    body.append(f'<Coords points="0,0 {w},0 {w},{h} 0,{h}"/>')
    for i, (y, x0, x1, aid, text) in enumerate(lines):
        custom = f' custom="structure {{id:{aid}; type:article;}}"' if aid else ""
        body.append(f'''<TextLine id="tl_{i}"{custom}>
      <Coords points="{x0},{y - 30} {x1},{y - 30} {x1},{y + 5} {x0},{y + 5}"/>
      <Baseline points="{x0},{y} {x1},{y}"/>
      <TextEquiv><Unicode>{text}</Unicode></TextEquiv>
    </TextLine>''')
    body.append("</TextRegion>")
    return f'''<?xml version="1.0" encoding="UTF-8"?>
<PcGts xmlns="http://schema.primaresearch.org/PAGE/gts/pagecontent/2013-07-15">
  <Metadata><Creator>t</Creator><Created>x</Created><LastChange>x</LastChange></Metadata>
  <Page imageFilename="{img}" imageWidth="{w}" imageHeight="{h}">
{chr(10).join(body)}
  </Page>
</PcGts>'''


GT_LINES = [(100, 50, 450, "a1", "l0"), (160, 50, 450, "a1", "l1"),
            (220, 50, 450, "a1", "l2"), (100, 550, 950, "a2", "l3"),
            (160, 550, 950, "a2", "l4"), (220, 550, 950, "a2", "l5")]


@pytest.fixture
def gt_page(tmp_path):
    p = tmp_path / "gt.xml"
    p.write_text(_page_xml(GT_LINES))
    return str(p)


# ---------------------------------------------------------------- measure
def test_perfect_hypothesis_scores_one(gt_page, tmp_path):
    hy = tmp_path / "hy.xml"
    hy.write_text(_page_xml(GT_LINES))
    bd, bd_wn, as_t = run_eval(gt_page, str(hy), min_tol=10, max_tol=30)
    assert bd[0] == pytest.approx(1.0) and bd[1] == pytest.approx(1.0)
    assert as_t[0] == pytest.approx(1.0) and as_t[1] == pytest.approx(1.0)
    assert as_t[2] == pytest.approx(1.0)


def test_merged_articles_hurt_as_not_bd(gt_page, tmp_path):
    merged = [(y, x0, x1, "a1", t) for (y, x0, x1, _, t) in GT_LINES]
    hy = tmp_path / "hy.xml"
    hy.write_text(_page_xml(merged))
    bd, _, as_t = run_eval(gt_page, str(hy), min_tol=10, max_tol=30)
    assert bd[2] == pytest.approx(1.0)   # baselines all found
    assert as_t[2] < 0.9                  # article F drops


def test_shifted_baselines_partial_credit(gt_page, tmp_path):
    shifted = [(y + 20, x0, x1, a, t) for (y, x0, x1, a, t) in GT_LINES]
    hy = tmp_path / "hy.xml"
    hy.write_text(_page_xml(shifted))
    bd, _, _ = run_eval(gt_page, str(hy), min_tol=10, max_tol=30)
    assert 0.0 < bd[2] < 1.0  # inside 3*tol falloff for small tols


def test_count_rel_hits_falloff():
    ev = BaselineMeasureEval(min_tol=10, max_tol=10)
    ev.truth_line_tols = np.array([[10.0]])
    a = Polygon([0, 100], [0, 0])
    from citlab_as_tpu.geometry.polygon import norm_poly_dists
    a_n, = norm_poly_dists([a], 5)
    # identical -> 1.0
    assert ev.count_rel_hits(a_n, a_n, np.array([10.0]))[0] == pytest.approx(1.0)
    # 20px off: between tol and 3*tol -> (30-20)/20 = 0.5
    b = Polygon([0, 100], [20, 20])
    b_n, = norm_poly_dists([b], 5)
    assert ev.count_rel_hits(a_n, b_n, np.array([10.0]))[0] == pytest.approx(0.5)
    # 40px off: beyond 3*tol -> 0
    c = Polygon([0, 100], [40, 40])
    c_n, = norm_poly_dists([c], 5)
    assert ev.count_rel_hits(a_n, c_n, np.array([10.0]))[0] == pytest.approx(0.0)


def test_dynamic_tolerances(gt_page, tmp_path):
    hy = tmp_path / "hy.xml"
    hy.write_text(_page_xml(GT_LINES))
    bd, _, as_t = run_eval(gt_page, str(hy), min_tol=-1, max_tol=-1)
    assert bd[2] == pytest.approx(1.0)
    assert as_t[2] == pytest.approx(1.0)


def test_greedy_sum():
    m = np.array([[0.9, 0.2], [0.3, 0.8]])
    assert get_greedy_sum(m) == pytest.approx(1.7)
    m2 = np.array([[0.9, 0.8], [0.85, 0.1]])
    # greedy: take 0.9 (0,0), then only (1,1)=0.1 left
    assert get_greedy_sum(m2) == pytest.approx(1.0)


def test_run_measure_averages(gt_page, tmp_path):
    hy = tmp_path / "hy.xml"
    hy.write_text(_page_xml(GT_LINES))
    out = run_measure([gt_page], [str(hy)], min_tol=10, max_tol=30, verbose=False)
    assert out["as"][2] == pytest.approx(1.0)
    assert out["counts"] == (1, 1, 1, 1)


def test_get_data_from_pagexml(gt_page):
    d = get_data_from_pagexml(gt_page)
    assert set(d.keys()) == {"a1", "a2"}
    assert len(d["a1"]) == 3


# ---------------------------------------------------------------- comparator
def test_sep_page_comparison_identical(gt_page, tmp_path):
    hy = tmp_path / "hy.xml"
    hy.write_text(_page_xml(GT_LINES))
    comper = SepPageBlComper()
    comper.loadGT(gt_page)
    comp = comper.compareTo(str(hy))
    assert comp.corrects == 2
    assert comp.splits == 0 and comp.merges == 0 and comp.dist == 0
    assert comp.checkConsistency()


def test_sep_page_comparison_split(gt_page, tmp_path):
    # split a1 into two articles
    split = list(GT_LINES)
    split[2] = (220, 50, 450, "a9", "l2")
    hy = tmp_path / "hy.xml"
    hy.write_text(_page_xml(split))
    comper = SepPageBlComper()
    comper.loadGT(gt_page)
    comp = comper.compareTo(str(hy))
    assert comp.gtNIs == 2 and comp.hypNIs == 3
    assert comp.splits == 1 and comp.merges == 0 and comp.dist == 1
    assert comp.corrects == 1  # a2 block still identical
    assert comp.checkConsistency()


def test_sep_page_comparison_merge(gt_page, tmp_path):
    merged = [(y, x0, x1, "a1", t) for (y, x0, x1, _, t) in GT_LINES]
    hy = tmp_path / "hy.xml"
    hy.write_text(_page_xml(merged))
    comper = SepPageBlComper()
    comper.loadGT(gt_page)
    comp = comper.compareTo(str(hy))
    # merges counter is hypNIs - |refinement| (negative when merging);
    # dist = splits - merges grows for both split and merge errors
    assert comp.splits == 0 and comp.merges == -1 and comp.dist == 1
    assert comp.checkConsistency()


def test_comp_dict_csv_roundtrip(gt_page, tmp_path):
    hy = tmp_path / "m1" / "hy.xml"
    hy.parent.mkdir()
    hy.write_text(_page_xml(GT_LINES))
    comper = SepPageBlComper()
    comper.loadGT(gt_page)
    comp = comper.compareTo(str(hy))

    spc = SepPageCompDict()
    spc.addItem("setA", gt_page, str(hy), comp)
    csv_path = tmp_path / "out.csv"
    spc.expCsv(csv_path)
    assert csv_path.exists()

    spc2 = SepPageCompDict()
    spc2.loadCSV(csv_path, [SepPageCompDict.path2method(str(hy)).lower()])
    loaded = spc2["setA"][gt_page][str(hy)]
    assert loaded.dist == comp.dist and loaded.corrects == comp.corrects


def test_tournament_and_xlsx(gt_page, tmp_path):
    # method good = identical; method bad = merged
    good = tmp_path / "good" / "hy.xml"
    good.parent.mkdir()
    good.write_text(_page_xml(GT_LINES))
    merged = [(y, x0, x1, "a1", t) for (y, x0, x1, _, t) in GT_LINES]
    bad = tmp_path / "bad" / "hy.xml"
    bad.parent.mkdir()
    bad.write_text(_page_xml(merged))

    comper = SepPageBlComper()
    comper.loadGT(gt_page)
    spc = SepPageCompDict()
    spc.addItem("setA", gt_page, str(good), comper.compareTo(str(good)))
    spc.addItem("setA", gt_page, str(bad), comper.compareTo(str(bad)))

    evaler = CompDictEvaler(spc)
    evaler.countWinnerStat()
    evaler.calcWinnerDict()
    stat = evaler.winnerStatDict["setA"]
    m_good = SepPageCompDict.path2method(str(good))
    m_bad = SepPageCompDict.path2method(str(bad))
    # diagonal counts equal sample count
    assert stat[m_good][m_good] == 1
    assert stat[m_bad][m_bad] == 1

    xlsx = tmp_path / "report.xlsx"
    evaler.winnerStat2xlsx(xlsx)
    assert xlsx.exists()
    with zipfile.ZipFile(xlsx) as zf:
        names = zf.namelist()
        assert "xl/workbook.xml" in names
        assert any("sheet" in n for n in names)
        # valid xml in each part
        from lxml import etree
        for n in names:
            if n.endswith(".xml"):
                etree.fromstring(zf.read(n))


def test_sqlite_export(gt_page, tmp_path):
    hy = tmp_path / "m" / "hy.xml"
    hy.parent.mkdir()
    hy.write_text(_page_xml(GT_LINES))
    comper = SepPageBlComper()
    comper.loadGT(gt_page)
    spc = SepPageCompDict()
    spc.addItem("setA", gt_page, str(hy), comper.compareTo(str(hy)))
    db = tmp_path / "out.db"
    spc.expSqlite(db, "allComps")
    import sqlite3
    con = sqlite3.connect(str(db))
    rows = con.execute("SELECT * FROM allComps").fetchall()
    con.close()
    assert len(rows) == 1


# ---------------------------------------------------------------- checker
def test_as_checker(tmp_path):
    lines = [(100, 50, 450, "a1", "text"), (160, 50, 450, None, "text"),
             (220, 50, 450, "a2", "")]
    p = tmp_path / "check.xml"
    p.write_text(_page_xml(lines))
    checker = AsChecker({AsProbCode.TL_11, AsProbCode.TL_12,
                         AsProbCode.TL_21, AsProbCode.TR_11})
    checker.page_list = [str(p)]
    checker.check_pages()
    codes = [pr.code for pr in checker.prob_dict[str(p)]]
    assert AsProbCode.TL_11 in codes  # empty text line
    assert AsProbCode.TL_12 in codes  # line without article
    assert AsProbCode.TL_21 in codes  # duplicate text
    assert AsProbCode.TR_11 in codes  # region with multiple article ids
    js = checker.prob_to_json()
    assert "TL_11" in js
    xlsx = tmp_path / "problems.xlsx"
    checker.probs_to_xlsx(xlsx)
    assert xlsx.exists()
