"""Analysis library tests (Plots/ notebook logic, SURVEY.md §2.10)."""
import numpy as np
import pandas as pd
import pytest

from mammodissect.analysis import (
    add_global_threshold,
    add_local_threshold,
    layer_mean_similarity,
    load_descriptions_csv,
    map_categories,
    top_categories_per_layer,
)
from mammodissect.analysis.postprocess import concept_domain_counts


@pytest.fixture()
def df():
    rows = []
    for layer, sims in [("blocks.0", [0.9, 0.1, 0.5]), ("blocks.1", [0.2, 0.4, 0.6])]:
        for unit, s in enumerate(sims):
            rows.append({
                "layer": layer, "unit": unit,
                "description": str([f"c{unit}", "x", "y"]),
                "similarity": str([s, s - 0.05, s - 0.1]),
                "images": str([1, 2, 3, 4, 5]),
            })
    return pd.DataFrame(rows)


def test_load_parses_lists_and_top(df):
    out = load_descriptions_csv(df)
    assert out.loc[0, "Top_concept"] == "c0"
    assert out.loc[0, "Top_similarity"] == pytest.approx(0.9)


def test_layer_mean_and_local_threshold(df):
    out = add_local_threshold(load_descriptions_csv(df))
    means = layer_mean_similarity(out)
    assert means["blocks.0"] == pytest.approx(0.5)
    # unit 0 (0.9) and unit 2 (0.5) meet the 0.5 mean; unit 1 (0.1) doesn't
    sub = out[out["layer"] == "blocks.0"]
    assert list(sub["Threshold_met"]) == [True, False, True]


def test_global_threshold_uses_max_of_runs(df):
    a = load_descriptions_csv(df)
    b = a.copy()
    b["Top_similarity"] = b["Top_similarity"] + 0.2  # run B systematically higher
    a2, b2, thresh = add_global_threshold(a, b)
    assert thresh["blocks.0"] == pytest.approx(0.7)  # max(0.5, 0.7)
    assert "Global_thresh_met" in a2.columns and "Global_thresh_met" in b2.columns
    assert a2[a2["layer"] == "blocks.0"]["Global_thresh_met"].tolist() == [True, False, False]


def test_category_mapping_and_topk(df):
    out = add_local_threshold(load_descriptions_csv(df))
    cmap = {"c0": "Findings", "c1": "Anatomy", "c2": "Findings"}
    out = map_categories(out, cmap)
    assert set(out["Category"]) <= {"Findings", "Anatomy", "Uncategorized"}
    top = top_categories_per_layer(out, k=1)
    assert (top.groupby("layer").size() <= 1).all()


def test_domain_counts(df):
    out = add_local_threshold(load_descriptions_csv(df))
    counts = concept_domain_counts(out, ["c0"], threshold_col="Threshold_met")
    row = counts[counts["layer"] == "blocks.0"].iloc[0]
    assert row["domain"] == 1 and row["other"] == 1  # units 0 (c0) and 2 (c2) pass


def test_figure4_rendering(tmp_path):
    """figures.fig4a/b/c render the Figure4.ipynb panels from postprocess frames
    to PNG artifacts (reference `Plots/Figure4.ipynb` cells 7-9)."""
    pytest.importorskip("matplotlib")
    import pandas as pd

    from mammodissect.analysis.figures import (
        fig4a_layer_means,
        fig4b_domain_counts,
        fig4c_top_categories,
    )
    from mammodissect.analysis.postprocess import (
        add_local_threshold,
        concept_domain_counts,
        layer_mean_similarity,
        load_descriptions_csv,
        map_categories,
        top_categories_per_layer,
    )

    rows = []
    for li, layer in enumerate(["blocks.0", "blocks.1", "blocks.2"]):
        for u in range(6):
            c = ["mass", "dog", "sky", "calcification", "tree", "grass"][u]
            rows.append(dict(layer=layer, unit=u,
                             description=str([c, "x"]),
                             similarity=str([0.5 + 0.1 * u + 0.01 * li, 0.1]),
                             images=str([0, 1])))
    df = load_descriptions_csv(pd.DataFrame(rows))
    df = add_local_threshold(df)
    df = map_categories(df, {"mass": "Findings", "calcification": "Findings",
                             "dog": "Animals", "sky": "Nature", "tree": "Nature",
                             "grass": "Nature"})

    p_a = tmp_path / "fig4a.png"
    fig4a_layer_means({"M": layer_mean_similarity(df),
                       "G": layer_mean_similarity(df) * 0.9}, str(p_a))
    p_b = tmp_path / "fig4b.png"
    fig4b_domain_counts(
        concept_domain_counts(df, ["mass", "calcification"]), str(p_b))
    p_c = tmp_path / "fig4c.png"
    fig4c_top_categories(top_categories_per_layer(df), str(p_c))
    for p in (p_a, p_b, p_c):
        assert p.exists() and p.stat().st_size > 2000


def test_workbook_category_maps_from_vendored_xlsx():
    """The vendored Extended_Breast_text_categories.xlsx parses into a usable
    concept -> Category / Broad_categories mapping (process_result_csvs cell 16),
    with no external Excel dependency (stdlib zip+XML reader)."""
    from mammodissect.assets import category_workbook_path, concept_set_path
    from mammodissect.analysis.postprocess import (
        load_category_map,
        load_workbook_category_maps,
        map_concepts_to_categories,
    )

    cat_map, broad_map = load_workbook_category_maps(category_workbook_path())
    assert set(cat_map) == set(broad_map)
    assert len(cat_map) > 500  # 6 sheets, 24 category columns, ~700 concepts
    # the 6 reference sheet names all appear as Broad_categories values
    sheets = set(broad_map.values())
    assert {"Breast_anatomy_or_structure", "Breast_locations", "Interpretations",
            "Action or follow up", "Environmental_and_Natural"} <= sheets
    # spot-checks against the workbook's known layout
    assert broad_map["breast"] == "Breast_anatomy_or_structure"
    assert cat_map["breast"] == "Breast Structures or Anatomy"

    # most of the canonical 763 concepts are categorized by the workbook
    with open(concept_set_path()) as f:
        concepts = [w for w in f.read().split("\n") if w.strip()]
    covered = sum(c in cat_map for c in concepts)
    assert covered > 400, f"only {covered}/763 concepts categorized"

    # load_category_map's xlsx branch returns the Category map
    assert load_category_map(category_workbook_path()) == cat_map

    # headless cell-16: both columns added, unmatched stays None
    df = pd.DataFrame({"Top_concept": ["breast", "no-such-concept"]})
    out = map_concepts_to_categories(df, category_workbook_path())
    assert out.loc[0, "Category"] == "Breast Structures or Anatomy"
    assert out.loc[0, "Broad_categories"] == "Breast_anatomy_or_structure"
    assert pd.isna(out.loc[1, "Category"])


def test_analyze_cli_end_to_end(tmp_path):
    """`python -m mammodissect.cli.analyze`: two dissection CSVs -> processed CSVs
    with Top_concept / thresholds / Global_thresh_met / workbook categories +
    Figure-4 artifacts — the full headless Plots/ flow from this repo alone."""
    pytest.importorskip("matplotlib")
    from mammodissect.cli.analyze import main

    rng = np.random.default_rng(0)
    concepts = ["breast", "mass", "calcification", "grass", "sky", "dog"]

    def make_csv(path, offset):
        rows = []
        for layer in ["blocks.0", "blocks.1"]:
            for u in range(6):
                cs = [concepts[(u + offset) % 6], concepts[(u + offset + 1) % 6]]
                rows.append(dict(layer=layer, unit=u, description=str(cs),
                                 similarity=str([0.3 + 0.1 * u, 0.1]),
                                 images=str([0, 1, 2])))
        pd.DataFrame(rows).to_csv(path, index=False)

    a, b = tmp_path / "M_desc.csv", tmp_path / "G_desc.csv"
    make_csv(a, 0)
    make_csv(b, 2)
    out = tmp_path / "out"
    # domain file with messy whitespace (trailing \r, padded lines, blanks) —
    # regression: entries were filtered on .strip() but stored UNstripped, so
    # none ever matched a Top_concept
    domain_file = tmp_path / "domain.txt"
    domain_file.write_text("mass\r\n  calcification  \n\nbreast\n")
    rc = main(["--csv", str(a), "--csv_b", str(b), "--out_dir", str(out),
               "--figures", "--domain_concepts", str(domain_file)])
    assert rc == 0

    pa = pd.read_csv(out / "M_desc_processed.csv")
    for col in ("Top_concept", "Threshold_met", "Global_thresh_met",
                "Category", "Broad_categories"):
        assert col in pa.columns, col
    # workbook mapping applied: 'breast' is a known workbook concept
    got = pa[pa.Top_concept == "breast"]["Broad_categories"]
    assert (got == "Breast_anatomy_or_structure").all() and len(got)
    assert (out / "global_thresholds.csv").exists()
    for fig in ("fig4a_layer_means.png", "fig4b_domain_counts.png",
                "fig4c_top_categories.png"):
        assert (out / fig).stat().st_size > 2000


def test_analyze_cli_same_basename_csvs_both_written(tmp_path):
    """Regression: --csv runs/M/descriptions.csv --csv_b runs/G/descriptions.csv
    collided on the basename stem and silently dropped one run's processed CSV."""
    from mammodissect.cli.analyze import main

    def make_csv(path):
        path.parent.mkdir(parents=True)
        rows = [dict(layer="blocks.0", unit=u, description=str(["mass", "sky"]),
                     similarity=str([0.5, 0.1]), images=str([0, 1]))
                for u in range(3)]
        pd.DataFrame(rows).to_csv(path, index=False)

    a = tmp_path / "M" / "descriptions.csv"
    b = tmp_path / "G" / "descriptions.csv"
    make_csv(a)
    make_csv(b)
    out = tmp_path / "out"
    assert main(["--csv", str(a), "--csv_b", str(b), "--out_dir", str(out)]) == 0
    import glob as _glob

    processed = sorted(_glob.glob(str(out / "*_processed.csv")))
    assert len(processed) == 2, processed
