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
    text = open(_DOC).read()
    out = []
    for m in re.finditer(r"## (\d+)\. ([^\n]+)\n.*?```python\n(.*?)```",
                         text, flags=re.S):
        out.append(pytest.param(m.group(3), id=f"recipe{m.group(1)}"))
    assert out, "no fenced python blocks found in COOKBOOK.md"
    return out


@pytest.mark.parametrize("code", _blocks())
def test_cookbook_recipe(spark, sf_dir, code):
    exec(compile(code, _DOC, "exec"), {"spark": spark, "sf": sf_dir})
