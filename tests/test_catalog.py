"""Catalog-drift guard (round-9 verdict #7): SURVEY.md §8.3 is ~170
prose table rows of `module.symbol` implementation pointers and gate
ids — nothing stopped a row from silently rotting as code moved. This
test parses every §8.3 row and asserts:

- every backticked DOTTED reference in the implementation column
  resolves to a real module or module attribute under stepist_spark
  (abbreviated house forms like ``dedup.exact_dup_groups`` resolve via
  the operators/functions/sources prefixes);
- every gate id (``t01``, ``q25``, ``m01`` …) named in the oracle
  column is a registered query in the driver registry;

plus a planted-stale-row case proving the checker actually fails on a
reference to a symbol that doesn't exist.
"""

from __future__ import annotations

import importlib
import re
from pathlib import Path

import pytest

SURVEY = Path(__file__).resolve().parents[1] / "SURVEY.md"

# full-backtick-content must look like a lowercase dotted path; this
# deliberately skips `spark.range(dim)` (parens), `F.session_window`
# (uppercase alias), `shard=K/`, bare symbols without dots, etc.
_DOTTED = re.compile(r"^[a-z_][a-z0-9_]*(?:\.[a-z_][a-z0-9_]*)+$")
# gate ids never abut a slash — that shape is percentile prose
# ("p25/p50/p95"), not a gate citation
_GATE = re.compile(r"(?<![/\w])([a-z]\d{2})(?![/\w])")

# house abbreviation order: exact package path first, then the
# operator/function/source families the survey shortens to
_PREFIXES = ("stepist_spark", "stepist_spark.operators",
             "stepist_spark.functions", "stepist_spark.sources")

# dotted-looking backtick tokens that are NOT stepist_spark refs
_NOT_REFS = frozenset({
    "stepist.flow.signals",  # reference-repo citation
})


def _survey_rows() -> list[list[str]]:
    text = SURVEY.read_text()
    m = re.search(r"^### 8\.3 .*?$(.*?)(?=^#|\Z)", text, re.M | re.S)
    assert m, "SURVEY.md §8.3 section not found"
    rows = []
    for line in m.group(1).splitlines():
        if not line.startswith("|"):
            continue
        # cells may contain escaped pipes (\|tokens\|) — split only on
        # unescaped | and unescape afterwards
        cells = [
            c.strip().replace("\\|", "|")
            for c in re.split(r"(?<!\\)\|", line.strip().strip("|"))
        ]
        if len(cells) < 3 or cells[0].startswith("---") or cells[0] == "extension":
            continue
        if len(cells) > 3:
            # some prose cells carry UNESCAPED pipes (|days|-sized,
            # |A|×|B|): keep extension and oracle at the edges, fold
            # the fragments back into the implementation cell
            cells = [cells[0], " | ".join(cells[1:-1]), cells[-1]]
        rows.append(cells)
    return rows


def _dotted_refs(cell: str) -> list[str]:
    return [
        tok
        for tok in re.findall(r"`([^`]+)`", cell)
        if _DOTTED.match(tok) and tok not in _NOT_REFS
    ]


def _resolve(ref: str) -> bool:
    """True iff ref is importable as a module or module attribute
    under one of the house prefixes."""
    for prefix in _PREFIXES:
        dotted = f"{prefix}.{ref}"
        try:
            importlib.import_module(dotted)
            return True
        except ImportError:
            pass
        mod_path, _, attr = dotted.rpartition(".")
        try:
            mod = importlib.import_module(mod_path)
        except ImportError:
            continue
        if hasattr(mod, attr):
            return True
    return False


def _registered_gate_prefixes() -> set[str]:
    from stepist_spark.queries import all_queries

    return {name.split("_", 1)[0] for name in all_queries()}


class TestCatalogDrift:
    def test_section_is_large(self):
        rows = _survey_rows()
        assert len(rows) >= 160, f"§8.3 shrank to {len(rows)} rows"

    def test_every_implementation_ref_resolves(self):
        stale: list[str] = []
        seen_refs = 0
        for ext, impl, _oracle in _survey_rows():
            for ref in _dotted_refs(impl):
                seen_refs += 1
                if not _resolve(ref):
                    stale.append(f"{ext!r}: `{ref}`")
        assert seen_refs >= 120, f"parser only saw {seen_refs} dotted refs"
        assert not stale, "stale §8.3 implementation refs:\n" + "\n".join(stale)

    def test_every_oracle_gate_is_registered(self):
        gates = _registered_gate_prefixes()
        stale: list[str] = []
        seen_gates = 0
        for ext, _impl, oracle in _survey_rows():
            # "the former t04 row" cites a retired gate on purpose
            cleaned = re.sub(r"former\s+[a-z]\d{2}", "", oracle)
            for gid in _GATE.findall(cleaned):
                seen_gates += 1
                if gid not in gates:
                    stale.append(f"{ext!r}: gate {gid}")
        assert seen_gates >= 150, f"parser only saw {seen_gates} gate ids"
        assert not stale, "unregistered §8.3 oracle gates:\n" + "\n".join(stale)

    def test_planted_stale_row_fails(self):
        # the checker must actually bite: a row pointing at a symbol
        # that doesn't exist resolves False ...
        assert not _resolve("operators.dedup.no_such_function_xyz")
        assert not _resolve("operators.no_such_module.fn")
        # ... and a planted unregistered gate id is caught
        assert "z99" not in _registered_gate_prefixes()
        # while the real things still resolve (guards the guard)
        assert _resolve("operators.dedup.exact_dup_groups")
        assert _resolve("dedup.exact_dup_groups")
        assert _resolve("functions.text.canonical_text")
        assert _resolve("operators.multimodal")

    def test_parser_skips_non_refs(self):
        assert _dotted_refs("`spark.range(dim)` and `F.session_window`") == []
        assert _dotted_refs("`shard=K/` `decoder=` `DECODER` `_meta`") == []
        assert _dotted_refs("`operators.corpus.zipf_slope`") == [
            "operators.corpus.zipf_slope"
        ]


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
