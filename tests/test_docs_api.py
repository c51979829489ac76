"""docs/api.md cannot rot: every documented symbol must exist.

The reference markets its API through rustdoc, which is checked by the
compiler; this is the moral equivalent for the hand-written reference
doc. Parser contract (kept deliberately simple): a ``## `module```
heading opens a section; within it, every list item starting ``- `name```
contributes (a) its FIRST backticked span and (b) any later span that
contains a call signature ``name(...)`` — each resolved as an attribute
of the section's module. Bare mid-line spans are prose and are skipped.
"""

import importlib
import os
import re

import jax

jax.config.update("jax_platforms", "cpu")

_DOC = os.path.join(os.path.dirname(__file__), "..", "docs", "api.md")
_IDENT = re.compile(r"^[A-Za-z_]\w*$")


def _documented_symbols():
    module = None
    out = []
    for line in open(_DOC):
        h = re.match(r"^## `([\w.]+)`", line)
        if h:
            module = h.group(1)
            continue
        if module is None or not line.startswith("- `"):
            continue
        spans = re.findall(r"`([^`]+)`", line)
        for pos, span in enumerate(spans):
            name = span.split("(")[0]
            if not _IDENT.match(name):
                continue
            if pos == 0 or "(" in span:
                out.append((module, name))
    return out


def test_api_doc_names_exist():
    symbols = _documented_symbols()
    # structure sanity: the doc has many sections and entries
    assert len({m for m, _ in symbols}) >= 8, symbols
    assert len(symbols) >= 60, len(symbols)
    missing = []
    for module, name in symbols:
        mod = importlib.import_module(module)
        if not hasattr(mod, name):
            missing.append(f"{module}.{name}")
    assert not missing, f"documented but nonexistent: {missing}"


def test_api_doc_covers_public_root():
    """Everything in the package's __all__ appears as a token inside
    SOME backticked span of the doc — plain-prose substring matches
    (e.g. 'io' inside 'observation') do not count."""
    import mini_mcmc_tpu as mm

    text = open(_DOC).read()
    tokens = {
        word
        for span in re.findall(r"`([^`]+)`", text)
        for word in re.findall(r"[A-Za-z_]\w*", span)
    }
    missing = [n for n in mm.__all__ if n not in tokens]
    assert not missing, f"public but undocumented: {missing}"
