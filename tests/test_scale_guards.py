"""Driver-memory guards: no registered query path may pull a data-sized
frame onto the driver. VERDICT r01 flagged `toPandas()` in
similarity_pairs_threshold / dedup_embedding_cosine as a 100 TB
driver-OOM; these static checks keep the pattern from coming back."""

import pathlib

PKG = pathlib.Path(__file__).resolve().parents[1] / "sample_emr_on_eks_fgac_iceberg_spark"

# .collect() sites that are explicitly bounded (not data-sized):
#   plans/explain.py        — test/bench helper, not a query path
#   operators/similarity.py — IVF probe selection: N_QUERIES (=10) rows
#   sources/warehouse.py    — DML commit planning: single-row aggregates
#                             (match count + collect_set of file paths,
#                             bounded by the table's data-file count —
#                             the same metadata Iceberg's commit handles)
ALLOWED_COLLECT_FILES = {
    "plans/explain.py",
    "operators/similarity.py",
    "sources/warehouse.py",
}


def _package_sources():
    for py in sorted(PKG.rglob("*.py")):
        yield py.relative_to(PKG).as_posix(), py.read_text()


def test_no_topandas_in_package_source():
    offenders = [
        f"{rel}:{i}"
        for rel, src in _package_sources()
        for i, line in enumerate(src.splitlines(), 1)
        if ".toPandas(" in line
    ]
    assert not offenders, f"driver-side toPandas() in query paths: {offenders}"


def test_collect_sites_are_allowlisted():
    offenders = [
        f"{rel}:{i}"
        for rel, src in _package_sources()
        for i, line in enumerate(src.splitlines(), 1)
        if ".collect()" in line and rel not in ALLOWED_COLLECT_FILES
    ]
    assert not offenders, f"unexpected driver-side collect(): {offenders}"
