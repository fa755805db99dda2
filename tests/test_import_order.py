"""Direct-import safety of the workload registry modules (r13): the
circular edge workload_{sources,curation} → workload_training used to
make `import workload_training` fail with a partially-initialized-
module ImportError unless something had fully loaded `workload`
first — an order-dependent landmine the full suite masked. Each case
runs in a SUBPROCESS so this test cannot be masked the same way."""

from __future__ import annotations

import subprocess
import sys

import pytest

DIRECT_IMPORTS = [
    "air_quality_etl_pipeline_spark.workload",
    "air_quality_etl_pipeline_spark.workload_training",
    "air_quality_etl_pipeline_spark.workload_curation",
    "air_quality_etl_pipeline_spark.workload_sources",
    "air_quality_etl_pipeline_spark.oracle_fragments",
]


@pytest.mark.parametrize("mod", DIRECT_IMPORTS)
def test_direct_import_succeeds(mod):
    proc = subprocess.run(
        [sys.executable, "-c", f"import {mod}"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]


def test_fragment_aliases_point_at_leaf():
    """The historical workload_training names must stay importable and
    identical to the leaf definitions (external tests import them)."""
    from air_quality_etl_pipeline_spark import oracle_fragments as of
    from air_quality_etl_pipeline_spark import workload_training as wt

    assert wt._QC_B == of.QC_B
    assert wt._QC_GRAMS == of.QC_GRAMS
    assert wt.QC_SCORE_ORACLE == of.QC_SCORE_ORACLE
    from air_quality_etl_pipeline_spark.workload_llm import TOKS

    assert TOKS == of.TOKS
