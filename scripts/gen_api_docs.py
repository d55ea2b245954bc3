"""Generate per-module API documentation as markdown from docstrings.

Offline replacement for the reference's mkdocs-material + mkdocstrings pipeline
(reference mkdocs.yml:75-86, docs/openmcmc/*.md): walks every public module of
``openmcmc_tpu``, emits one markdown page per module into docs/api/ with the module
docstring plus every public class (with methods) and function signature + docstring.
Pure stdlib (inspect), so it runs in the no-network container; the emitted markdown is
also what the mkdocs config (mkdocs.yml) serves when mkdocs-material is available.

Usage: python scripts/gen_api_docs.py  (writes docs/api/*.md and docs/api/index.md)
"""

from __future__ import annotations

import importlib
import inspect
import pkgutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import openmcmc_tpu  # noqa: E402

OUT = Path(__file__).resolve().parent.parent / "docs" / "api"


def _signature(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _doc(obj) -> str:
    doc = inspect.getdoc(obj)
    return doc if doc else "*No docstring.*"


def _document_class(cls, lines: list) -> None:
    lines.append(f"### class `{cls.__name__}{_signature(cls)}`\n")
    lines.append(_doc(cls) + "\n")
    for name, member in sorted(vars(cls).items()):
        if name.startswith("_") and name not in ("__init__",):
            continue
        if inspect.isfunction(member):
            lines.append(f"#### `{cls.__name__}.{name}{_signature(member)}`\n")
            if inspect.getdoc(member):
                lines.append(inspect.getdoc(member) + "\n")
        elif isinstance(member, property):
            lines.append(f"#### property `{cls.__name__}.{name}`\n")
            if inspect.getdoc(member):
                lines.append(inspect.getdoc(member) + "\n")


def document_module(modname: str) -> str:
    mod = importlib.import_module(modname)
    lines = [f"# `{modname}`\n", _doc(mod) + "\n"]
    members = [
        (name, obj)
        for name, obj in sorted(vars(mod).items())
        if not name.startswith("_") and getattr(obj, "__module__", None) == modname
    ]
    classes = [(n, o) for n, o in members if inspect.isclass(o)]
    functions = [(n, o) for n, o in members if inspect.isfunction(o)]
    if classes:
        lines.append("## Classes\n")
        for _, cls in classes:
            _document_class(cls, lines)
    if functions:
        lines.append("## Functions\n")
        for name, fn in functions:
            lines.append(f"### `{name}{_signature(fn)}`\n")
            lines.append(_doc(fn) + "\n")
    return "\n".join(lines)


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    modules = ["openmcmc_tpu"]
    pkg_path = Path(openmcmc_tpu.__file__).parent
    for info in pkgutil.walk_packages([str(pkg_path)], prefix="openmcmc_tpu."):
        if "._" in info.name:
            continue
        modules.append(info.name)

    index = ["# openmcmc_tpu API reference\n",
             "Generated from docstrings by `scripts/gen_api_docs.py` "
             "(the offline analog of the reference's mkdocstrings pages).\n"]
    for modname in modules:
        page = document_module(modname)
        fname = modname.replace(".", "_") + ".md"
        (OUT / fname).write_text(page)
        index.append(f"- [{modname}]({fname})")
    (OUT / "index.md").write_text("\n".join(index) + "\n")
    print(f"wrote {len(modules)} module pages to {OUT}")


if __name__ == "__main__":
    main()
