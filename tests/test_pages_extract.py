"""Pages corpus + extract_text invariants (north rule: byte-identical text
per url at every parallelism level)."""

import numpy as np
import pandas as pd
import pytest

from whitebox_tools_ray.functions.extract_html import ExtractText, extract_text_one
from whitebox_tools_ray.sources.synthetic import gen_pages


def test_extract_golden_cases():
    assert extract_text_one("<html><head><title>T</title></head><body><p>hi you</p></body></html>") == "hi you"
    # head removed wholesale (title never leaks into text)
    assert "T9" not in extract_text_one("<html><head><title>T9</title></head><body>x</body></html>")
    # script contents removed even with a '<' inside
    assert extract_text_one("<body><script>var x = 1 < 2;</script><p>ok</p></body>") == "ok"
    # unclosed tag consumes through the next '>' (deterministic closure)
    assert extract_text_one("<body><p>a</p><p broken</body>") == "a"
    # with no '>' following at all, the fragment survives literally
    assert extract_text_one("<body><p>a</p><p broken") == "a <p broken"
    # whitespace collapse + strip
    assert extract_text_one("<body>  a \n\t b  </body>") == "a b"
    # empty body
    assert extract_text_one("<html><head><title>T</title></head><body></body></html>") == ""


def test_gen_pages_deterministic_and_shardable():
    a = gen_pages(np.arange(100))
    b = gen_pages(np.arange(100))
    pd.testing.assert_frame_equal(a, b)
    # shard independence: rows 50..99 generated alone match the full run
    c = gen_pages(np.arange(50, 100)).reset_index(drop=True)
    pd.testing.assert_frame_equal(a.iloc[50:].reset_index(drop=True), c)


def test_gen_pages_text_matches_extraction():
    df = gen_pages(np.arange(500))
    ext = ExtractText(html_col="html", out_col="t2")(df.copy())
    assert (ext["t2"] == df["text"]).all()


def test_edge_cases_present():
    df = gen_pages(np.arange(1000))
    # some empty texts (edge case 0)
    assert (df["text"].str.len() == 0).any()
    # hot-cell skew: ~20% of rows in the 5 urban boxes
    from whitebox_tools_ray.sources.synthetic import HOT_BOXES, HOT_HALF

    hot = np.zeros(len(df), bool)
    for bx, by in HOT_BOXES:
        hot |= (np.abs(df["lon"].to_numpy() - bx) <= HOT_HALF) & \
               (np.abs(df["lat"].to_numpy() - by) <= HOT_HALF)
    assert 0.15 < hot.mean() < 0.25


@pytest.mark.usefixtures("ray_session")
def test_parallelism_invariance():
    """Same corpus generated + extracted at different batch sizes/parallelism
    -> byte-identical text per url (the north-rule invariant, evidenced
    within one session by varying block structure; bench --scaling varies
    num_cpus across processes)."""
    from whitebox_tools_ray.sources.synthetic import pages_dataset

    def run(blocks, batch_size):
        ds = pages_dataset(2000, blocks=blocks)
        ds = ds.map_batches(ExtractText, fn_constructor_kwargs={"out_col": "t2"},
                            batch_format="pandas", batch_size=batch_size,
                            concurrency=(1, 2))
        df = ds.to_pandas().sort_values("page_id").reset_index(drop=True)
        return df

    a = run(2, 1000)
    b = run(7, 333)
    assert (a["url"] == b["url"]).all()
    assert (a["t2"] == b["t2"]).all()
    assert (a["t2"] == a["text"]).all()


def test_arrow_kernel_matches_ground_truth_and_python_spec():
    """The RE2/Arrow kernel (the flagship's hot path) must produce the
    same bytes as the corpus ground-truth text column, and match the
    Python-re reference kernel on ASCII inputs — including \v, which
    Python's \s collapses (the split/join form covers it; RE2's \s does
    not)."""
    import pyarrow as pa

    from whitebox_tools_ray.functions.extract_html import extract_text_arrow

    df = gen_pages(np.arange(2000))
    t = pa.table({"html": df["html"].to_numpy()})
    got = extract_text_arrow(t, out_col="t2")["t2"].to_pylist()
    assert got == df["text"].tolist()

    edges = [
        "<body>  a \n\t b  </body>",
        "<body>a\x0b b</body>",                      # vertical tab
        "<body><p>a</p><p broken",                   # no closing '>' at all
        "<body><script>var x = 1 < 2;</script>ok</body>",
        "<html><head><title>T</title></head><body></body></html>",
        "<body><style>p { color: red; }</style>x<script>1</script></body>",
        "",
    ]
    t2 = pa.table({"html": edges})
    got2 = extract_text_arrow(t2, out_col="t2")["t2"].to_pylist()
    assert got2 == [extract_text_one(h) for h in edges]
