"""Real-third-party-library leg (r14 verdict stretch #8): the pypdf /
pdfplumber / PIL ADAPTER PATHS run in default CI against fake modules
injected into sys.modules (tests/test_pdf_source.py,
tests/test_multimodal.py) — these tests run them against the REAL
libraries, converting 'adapter never executed against the real thing'
into an env-gated leg, exactly like the SPARK_GRAFT_LIVE HTTP smoke.

Gate: SPARK_GRAFT_EXTRAS=1 AND the libraries importable. This container
ships none of them and pip installs are out of scope here, so the leg
skips by default; ``tools/extras_leg.sh`` is the one-command runner for
an environment that allows installs. The assertions are EQUIVALENCE
claims: the real library must reproduce what the stdlib mini paths
already compute on the committed fixtures — so a green run proves the
adapter seam, not merely that the library imports.
"""

from __future__ import annotations

import importlib.util
import os
import pathlib

import pytest

_FIX = pathlib.Path(__file__).parent / "fixtures"

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_EXTRAS") != "1",
    reason="real-library leg: set SPARK_GRAFT_EXTRAS=1 (and pip install "
    "pypdf pdfplumber pillow — see tools/extras_leg.sh)",
)


def _have(mod: str) -> bool:
    return importlib.util.find_spec(mod) is not None


@pytest.mark.skipif(not _have("PIL"), reason="pillow not installed")
def test_pil_decode_matches_stdlib_png_path(spark):
    """_decode_payload's PIL route must return the same (w, h, pixels)
    as the stdlib inflate+unfilter path on real synthesized PNGs —
    pinned over the dHash so a channel-order or stride mismatch fails."""
    from yfinance_etl_spark.multimodal import columns as mm

    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id bigint")
    assets = mm.synthesize_png_assets(docs)
    payloads = [bytes(r.content) for r in assets.collect()]
    for b in payloads:
        w_m, h_m, body_m = mm._decode_png_mini(b)
        assert mm.HAVE_PIL
        w_p, h_p, body_p = mm._decode_payload(b)  # routes through PIL
        assert (w_p, h_p) == (w_m, h_m)
        assert body_p == body_m


@pytest.mark.skipif(not _have("pypdf"), reason="pypdf not installed")
def test_real_pypdf_matches_mini_extractor_on_fixture():
    from yfinance_etl_spark.sources.pdf import _extract_text_mini, _parse_pdf_real

    b = (_FIX / "tiny_flate.pdf").read_bytes()
    real = [" ".join(p.split()) for p in _parse_pdf_real(b, backend="pypdf")]
    mini = [" ".join(p.split()) for p in _extract_text_mini(b)]
    assert real == mini


@pytest.mark.skipif(not _have("pdfplumber"), reason="pdfplumber not installed")
def test_real_pdfplumber_matches_mini_extractor_on_fixture():
    from yfinance_etl_spark.sources.pdf import _extract_text_mini, _parse_pdf_real

    b = (_FIX / "tiny_flate.pdf").read_bytes()
    real = [" ".join(p.split()) for p in _parse_pdf_real(b, backend="pdfplumber")]
    mini = [" ".join(p.split()) for p in _extract_text_mini(b)]
    assert real == mini
