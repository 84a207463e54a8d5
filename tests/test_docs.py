r"""The generated API docs stay in sync with the docstrings.

The reference gates its Sphinx docs through CI (reference:
.github/workflows/ci.yaml doctest job + docs/); here the generator is
self-contained (docs/build.py) and this test regenerates the pages and
compares them to the committed output — stale docs fail CI."""

import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent


def test_api_docs_in_sync(tmp_path):
    sys.path.insert(0, str(ROOT / "docs"))
    try:
        import build as docs_build
    finally:
        sys.path.pop(0)

    pages = docs_build.build(tmp_path)
    assert len(pages) >= 16
    committed = ROOT / "docs" / "api"
    for page in pages:
        ref = committed / page.name
        assert ref.exists(), f"missing committed page {page.name}"
        assert ref.read_text() == page.read_text(), (
            f"{page.name} is stale — run `python docs/build.py`"
        )


def test_api_docs_cover_the_zoo():
    text = (ROOT / "docs" / "api" / "flows.md").read_text()
    for fam in ["NSF", "MAF", "NICE", "RealNVP", "NCSF", "NAF", "UNAF",
                "CNF", "SOSPF", "BPF", "GF"]:
        assert f"`{fam}(" in text, fam
