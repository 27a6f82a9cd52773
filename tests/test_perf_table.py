"""README perf table must equal the committed bench artifact (VERDICT r3
item 4): the table is generated from the newest BENCH_r*.json by
scripts/gen_perf_table.py, and this test fails whenever the README block
differs from what the generator produces — hand-edits and stale numbers
both fail CI instead of waiting for a human to cross-read the JSON."""

import importlib.util
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_gen():
    spec = importlib.util.spec_from_file_location(
        "gen_perf_table", os.path.join(ROOT, "scripts",
                                       "gen_perf_table.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_readme_table_matches_artifact():
    gen = _load_gen()
    block = gen.render(gen.latest_artifact())
    with open(os.path.join(ROOT, "README.md")) as f:
        text = f.read()
    m = re.search(re.escape(gen.START) + ".*?" + re.escape(gen.END),
                  text, re.DOTALL)
    assert m, "README.md lost the BENCH_TABLE markers"
    assert m.group(0) == block, (
        "README.md perf table is stale or hand-edited; run "
        "python scripts/gen_perf_table.py")


def test_no_prose_rate_numbers_outside_table():
    """Every solves/s-style number in the README lives inside the
    generated block (or quotes a north-star target), so the artifact is
    the single source of perf truth."""
    gen = _load_gen()
    with open(os.path.join(ROOT, "README.md")) as f:
        text = f.read()
    stripped = re.sub(re.escape(gen.START) + ".*?" + re.escape(gen.END),
                      "", text, flags=re.DOTALL)
    # rate-like claims: "<number>k solves/s", "N solves/s" etc.
    hits = re.findall(r"[\d,.]+[kKM]?\s*(?:solves/s|ticks/s|steps/s|"
                      r"inferences/s)", stripped)
    allowed = {"100,000 solves/s", "100k solves/s"}  # the north star
    bad = [h for h in hits if h.strip() not in allowed]
    assert not bad, f"prose perf numbers outside the generated table: {bad}"


def test_notes_numbers_match_artifact():
    """The newest NOTES_ROUND*.md carrying the numbers markers must
    also equal the generated block (VERDICT r4 item 8: notes prose
    drifted from driver artifacts in r4)."""
    gen = _load_gen()
    notes = gen.latest_notes()
    if notes is None:
        return
    block = gen.render(gen.latest_artifact())
    with open(notes) as f:
        text = f.read()
    m = re.search(re.escape(gen.START) + ".*?" + re.escape(gen.END),
                  text, re.DOTALL)
    assert m and m.group(0) == block, (
        f"{os.path.basename(notes)} numbers block is stale; run "
        "python scripts/gen_perf_table.py")
