"""Execute every fenced python block in docs/COOKBOOK.md against the
sf0.001 testdata — the recipes are self-verifying (asserts inline), so
the cookbook cannot drift from the library."""

from __future__ import annotations

import os
import re

import pytest

_DOC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "docs", "COOKBOOK.md")


def _blocks():
    """One fenced block per '## N.' section, matched WITHIN the section —
    a cross-boundary regex would silently attribute the next section's
    block to a code-less section (ADVICE r7)."""
    text = open(_DOC).read()
    out = []
    sections = re.split(r"(?m)^## ", text)[1:]
    for sec in sections:
        head = re.match(r"(\d+)\. ", sec)
        assert head, f"unnumbered cookbook section: {sec[:60]!r}"
        blocks = re.findall(r"```python\n(.*?)```", sec, flags=re.S)
        assert len(blocks) == 1, (
            f"cookbook section {head.group(1)} has {len(blocks)} python "
            "blocks; exactly one expected"
        )
        out.append(pytest.param(blocks[0], id=f"recipe{head.group(1)}"))
    assert out, "no fenced python blocks found in COOKBOOK.md"
    return out


@pytest.mark.parametrize("code", _blocks())
def test_cookbook_recipe(spark, sf_dir, code):
    exec(compile(code, _DOC, "exec"), {"spark": spark, "sf": sf_dir})
