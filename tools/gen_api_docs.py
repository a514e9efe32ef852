"""Generate docs/api.md from the package's docstrings.

Stdlib-only API reference generator (the image has no sphinx wheels;
the reference ships a sphinx scaffold whose pages are empty stubs —
reference docs/source/index.rst, SURVEY.md §6).  Walks every module
under ``queasars_tpu``, collects public classes/functions with their
signatures and first docstring paragraphs, and writes one markdown
index.

Run from the repo root (CPU is fine):

    python tools/gen_api_docs.py

The lint gate keeps the file fresh: tests/test_api_docs.py regenerates
in-memory and diffs against the committed docs/api.md.
"""

from __future__ import annotations

import importlib
import inspect
import pkgutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / "docs" / "api.md"


def first_paragraph(obj) -> str:
    doc = inspect.getdoc(obj)
    if not doc:
        return ""
    para = doc.split("\n\n")[0]
    return " ".join(line.strip() for line in para.splitlines()).strip()


def format_signature(obj) -> str:
    try:
        sig = str(inspect.signature(obj))
    except (TypeError, ValueError):
        return ""
    if len(sig) > 110:
        sig = sig[:107] + "..."
    return sig


def public_members(module):
    """(classes, functions) defined in this module, honoring __all__."""
    exported = getattr(module, "__all__", None)
    classes, functions = [], []
    for name, obj in sorted(vars(module).items()):
        if name.startswith("_"):
            continue
        if exported is not None and name not in exported:
            continue
        if getattr(obj, "__module__", None) != module.__name__:
            continue
        if inspect.isclass(obj):
            classes.append((name, obj))
        elif inspect.isfunction(obj):
            functions.append((name, obj))
    return classes, functions


def class_methods(cls):
    out = []
    for name, member in sorted(vars(cls).items()):
        if name.startswith("_"):
            continue
        if inspect.isfunction(member) or isinstance(member, (staticmethod, classmethod)):
            fn = member.__func__ if isinstance(member, (staticmethod, classmethod)) else member
            out.append((name, fn))
        elif isinstance(member, property) and member.fget is not None:
            out.append((name, member.fget))
    return out


def generate() -> str:
    import queasars_tpu

    lines = [
        "# API reference",
        "",
        "Generated from docstrings by `tools/gen_api_docs.py` — do not edit",
        "by hand (regenerate with `python tools/gen_api_docs.py`; freshness",
        "is enforced by `tests/test_api_docs.py`).  One section per module;",
        "entries are the module's public classes and functions with their",
        "signatures and summary lines.  Full parameter documentation lives",
        "in the docstrings themselves (`help()` / `pydoc`).",
        "",
    ]

    modules = []
    for info in pkgutil.walk_packages(queasars_tpu.__path__, prefix="queasars_tpu."):
        if info.name.endswith("__main__"):
            continue
        modules.append(info.name)
    modules.sort()

    # table of contents
    lines.append("## Modules")
    lines.append("")
    for name in modules:
        anchor = name.replace(".", "")
        lines.append(f"- [`{name}`](#{anchor})")
    lines.append("")

    for name in modules:
        module = importlib.import_module(name)
        lines.append(f"## `{name}`")
        lines.append("")
        summary = first_paragraph(module)
        if summary:
            lines.append(summary)
            lines.append("")
        classes, functions = public_members(module)
        for cls_name, cls in classes:
            lines.append(f"### class `{cls_name}{format_signature(cls)}`")
            lines.append("")
            doc = first_paragraph(cls)
            if doc:
                lines.append(doc)
                lines.append("")
            methods = class_methods(cls)
            if methods:
                for m_name, fn in methods:
                    m_doc = first_paragraph(fn)
                    suffix = f" — {m_doc}" if m_doc else ""
                    lines.append(f"- `{m_name}{format_signature(fn)}`{suffix}")
                lines.append("")
        for fn_name, fn in functions:
            lines.append(f"### `{fn_name}{format_signature(fn)}`")
            lines.append("")
            doc = first_paragraph(fn)
            if doc:
                lines.append(doc)
                lines.append("")
    return "\n".join(lines).rstrip() + "\n"


def main() -> None:
    text = generate()
    OUT.write_text(text)
    n_sections = text.count("\n## ")
    print(f"wrote {OUT} ({len(text.splitlines())} lines, {n_sections} module sections)")


if __name__ == "__main__":
    sys.path.insert(0, str(REPO))
    main()
