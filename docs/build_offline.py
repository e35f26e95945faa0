"""Offline docs builder: render docs/ to HTML with no Sphinx and no
network.

The reference builds its API reference with Sphinx + readthedocs
(/root/reference/docs/conf.py, make_references.py). Sphinx is not
installable in this offline environment, so this builder renders the
same sources (docs/*.rst with their ``automodule``/``autoclass``/
``autofunction`` directives, docs/models.md, the repo README) using a
minimal RST subset + the stdlib-adjacent ``markdown`` package, with a
real introspection-driven autodoc (signatures + docstrings pulled from
the live package). conf.py is kept for a networked readthedocs build.

Usage:
    python docs/build_offline.py [--out docs/_build] [--check]

``--check`` (the CI mode, see ci/run.py --slow) builds into a temp dir
and fails if any autodoc target fails to import/resolve or any page
renders empty.
"""

from __future__ import annotations

import argparse
import html
import importlib
import inspect
import os
import re
import sys
import tempfile
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")

DOCS = Path(__file__).resolve().parent
REPO = DOCS.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

STYLE = """
body { font-family: system-ui, sans-serif; max-width: 60rem;
       margin: 2rem auto; padding: 0 1rem; line-height: 1.55;
       color: #1a1a1a; }
pre { background: #f6f8fa; padding: .8rem; overflow-x: auto;
      border-radius: 6px; font-size: .9rem; }
code { background: #f0f2f4; padding: .1rem .25rem; border-radius: 4px;
       font-size: .92em; }
pre code { background: none; padding: 0; }
h1, h2, h3 { line-height: 1.25; }
h1 { border-bottom: 2px solid #e3e6e8; padding-bottom: .3rem; }
h2 { border-bottom: 1px solid #eceff1; padding-bottom: .2rem; }
.sig { background: #eef3f8; padding: .5rem .8rem; border-left: 3px solid
       #4078c0; border-radius: 4px; font-family: monospace;
       white-space: pre-wrap; }
.member { margin-left: 1.2rem; }
table { border-collapse: collapse; }
td, th { border: 1px solid #d0d7de; padding: .3rem .6rem; }
nav a { margin-right: 1rem; }
.docstring { white-space: pre-wrap; font-family: inherit;
             background: none; padding: 0 0 0 .2rem; }
"""

PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>{style}</style></head><body>
<nav><a href="index.html">index</a><a href="api.html">API</a>
<a href="models.html">models</a><a href="formats.html">formats</a></nav>
{body}
</body></html>
"""


class DocError(Exception):
    pass


# --------------------------------------------------------------------
# autodoc: introspection -> HTML
# --------------------------------------------------------------------

def _esc(s: str) -> str:
    return html.escape(s, quote=False)


def _sig(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _doc_html(obj) -> str:
    doc = inspect.getdoc(obj) or ""
    if not doc:
        return ""
    return f'<pre class="docstring">{_esc(doc)}</pre>'


def _resolve(dotted: str):
    """Import `a.b.C` (module, or attribute of a module)."""
    parts = dotted.split(".")
    for split in range(len(parts), 0, -1):
        mod_name = ".".join(parts[:split])
        try:
            obj = importlib.import_module(mod_name)
        except ImportError:
            continue
        try:
            for attr in parts[split:]:
                obj = getattr(obj, attr)
        except AttributeError:
            break
        return obj
    raise DocError(f"cannot resolve autodoc target {dotted!r}")


def _render_function(name: str, fn) -> str:
    return (
        f'<div class="member"><div class="sig">{_esc(name)}{_esc(_sig(fn))}'
        f"</div>{_doc_html(fn)}</div>"
    )


def _render_class(dotted: str, members: list[str]) -> str:
    cls = _resolve(dotted)
    out = [f"<h3><code>class {_esc(dotted)}</code></h3>"]
    try:
        out.append(f'<div class="sig">{_esc(cls.__name__)}{_esc(_sig(cls))}'
                   "</div>")
    except DocError:
        pass
    out.append(_doc_html(cls))
    if not members:
        members = [
            n for n, v in vars(cls).items()
            if not n.startswith("_")
            and (callable(v) or isinstance(v, property))
        ]
    for m in members:
        try:
            attr = getattr(cls, m)
        except AttributeError as exc:
            raise DocError(f"{dotted}.{m} does not exist") from exc
        if isinstance(attr, property):
            out.append(
                f'<div class="member"><div class="sig">{_esc(m)} '
                f"(property)</div>{_doc_html(attr)}</div>"
            )
        elif callable(attr):
            out.append(_render_function(f"{cls.__name__}.{m}", attr))
    return "\n".join(out)


def _render_module(dotted: str, members: list[str]) -> str:
    mod = _resolve(dotted)
    out = [f"<h3><code>module {_esc(dotted)}</code></h3>", _doc_html(mod)]
    if not members:
        members = sorted(getattr(mod, "__all__", []))
    for m in members:
        try:
            attr = getattr(mod, m)
        except AttributeError as exc:
            raise DocError(f"{dotted}.{m} does not exist") from exc
        if inspect.isclass(attr):
            out.append(_render_class(f"{dotted}.{m}", []))
        elif callable(attr):
            out.append(_render_function(m, attr))
    return "\n".join(out)


# --------------------------------------------------------------------
# minimal RST renderer (the subset docs/*.rst actually uses)
# --------------------------------------------------------------------

_INLINE_RULES = [
    (re.compile(r"``(.+?)``"), r"<code>\1</code>"),
    (re.compile(r":mod:`(.+?)`"), r"<code>\1</code>"),
    (re.compile(r":class:`(.+?)`"), r"<code>\1</code>"),
    (re.compile(r":func:`(.+?)`"), r"<code>\1</code>"),
    (re.compile(r":doc:`(\w+)`"), r'<a href="\1.html">\1</a>'),
    (re.compile(r"\*\*(.+?)\*\*"), r"<strong>\1</strong>"),
    (re.compile(r"(?<!\*)\*([^*\n]+)\*(?!\*)"), r"<em>\1</em>"),
    (re.compile(r"`([^`<]+) <([^>]+)>`_+"), r'<a href="\2">\1</a>'),
]


def _inline(text: str) -> str:
    text = _esc(text)
    for rule, repl in _INLINE_RULES:
        text = rule.sub(repl, text)
    return text


def render_rst(text: str) -> str:
    lines = text.splitlines()
    out: list[str] = []
    para: list[str] = []
    i = 0

    def flush():
        if para:
            out.append(f"<p>{_inline(' '.join(para))}</p>")
            para.clear()

    def take_block(start: int) -> tuple[list[str], int]:
        """Collect the indented block following a directive/literal."""
        block = []
        j = start
        while j < len(lines):
            ln = lines[j]
            if ln.strip() and not ln.startswith(("   ", "\t")):
                break
            block.append(ln)
            j += 1
        while block and not block[0].strip():
            block.pop(0)
        while block and not block[-1].strip():
            block.pop()
        dedented = [ln[3:] if ln.startswith("   ") else ln for ln in block]
        return dedented, j

    while i < len(lines):
        line = lines[i]
        nxt = lines[i + 1] if i + 1 < len(lines) else ""
        # section heading: text underlined by ===, ---, ~~~
        if (
            line.strip()
            and nxt
            and set(nxt.strip()) <= set("=-~^")
            and len(nxt.strip()) >= max(3, len(line.strip()) - 2)
            and not line.startswith(" ")
        ):
            flush()
            level = {"=": 1, "-": 2, "~": 3, "^": 4}[nxt.strip()[0]]
            out.append(f"<h{level}>{_inline(line.strip())}</h{level}>")
            i += 2
            continue
        m = re.match(r"\s*\.\.\s+(\S+)::\s*(.*)", line)
        if m:
            flush()
            directive, arg = m.group(1), m.group(2).strip()
            block, j = take_block(i + 1)
            opts: dict[str, str] = {}
            body: list[str] = []
            for ln in block:
                om = re.match(r":(\S+):\s*(.*)", ln.strip())
                if om and not body:
                    opts[om.group(1)] = om.group(2)
                elif ln.strip() or body:
                    body.append(ln)
            if directive == "code-block":
                code = _esc("\n".join(body))
                out.append(f"<pre><code>{code}</code></pre>")
            elif directive == "toctree":
                items = [b.strip() for b in body if b.strip()]
                out.append("<ul>" + "".join(
                    f'<li><a href="{b}.html">{b}</a></li>' for b in items
                ) + "</ul>")
            elif directive == "automodule":
                members = [
                    s.strip() for s in opts.get("members", "").replace(
                        "\n", " ").split(",") if s.strip()
                ]
                # continuation lines of :members: end up in body
                for ln in body:
                    members += [
                        s.strip() for s in ln.split(",") if s.strip()
                    ]
                out.append(_render_module(arg, members))
            elif directive == "autoclass":
                members = [
                    s.strip() for s in opts.get("members", "").split(",")
                    if s.strip()
                ]
                for ln in body:
                    members += [
                        s.strip() for s in ln.split(",") if s.strip()
                    ]
                out.append(_render_class(arg, members))
            elif directive == "autofunction":
                fn = _resolve(arg)
                out.append(_render_function(arg.split(".")[-1], fn))
            else:  # note, warning, image, ... render as a quoted block
                quoted = _inline("\n".join(body))
                out.append(
                    f"<blockquote><strong>{_esc(directive)}</strong><br>"
                    f"{quoted}</blockquote>"
                )
            i = j
            continue
        if line.rstrip().endswith("::") and not line.lstrip().startswith(
            ".."
        ):
            text_part = line.rstrip()[:-2].rstrip()
            if text_part:
                para.append(text_part + ":")
            flush()
            block, j = take_block(i + 1)
            out.append(f"<pre><code>{_esc(chr(10).join(block))}</code></pre>")
            i = j
            continue
        if re.match(r"\s*[-*]\s+", line):
            flush()
            items = []
            while i < len(lines) and re.match(r"\s*[-*]\s+", lines[i]):
                item = re.sub(r"\s*[-*]\s+", "", lines[i], count=1)
                i += 1
                while i < len(lines) and lines[i].startswith("  ") and (
                    not re.match(r"\s*[-*]\s+", lines[i])
                ):
                    item += " " + lines[i].strip()
                    i += 1
                items.append(f"<li>{_inline(item)}</li>")
            out.append("<ul>" + "".join(items) + "</ul>")
            continue
        if not line.strip():
            flush()
            i += 1
            continue
        para.append(line.strip())
        i += 1
    flush()
    return "\n".join(out)


# --------------------------------------------------------------------
# build
# --------------------------------------------------------------------

def build(out_dir: Path) -> list[Path]:
    import markdown

    out_dir.mkdir(parents=True, exist_ok=True)
    written: list[Path] = []

    def emit(name: str, title: str, body: str):
        if not body.strip():
            raise DocError(f"page {name} rendered empty")
        p = out_dir / f"{name}.html"
        p.write_text(PAGE.format(title=title, style=STYLE, body=body))
        written.append(p)

    # regenerate models.md from the live model registry (the reference
    # generates its model docs the same way: make_model_descriptions.py)
    import subprocess

    subprocess.run(
        [sys.executable, str(DOCS / "make_model_descriptions.py")],
        check=True,
    )

    md = markdown.Markdown(extensions=["tables", "fenced_code"])
    for rst in sorted(DOCS.glob("*.rst")):
        emit(rst.stem, f"sanafe_tpu — {rst.stem}",
             render_rst(rst.read_text()))
    for mdf in sorted(DOCS.glob("*.md")):
        emit(mdf.stem, f"sanafe_tpu — {mdf.stem}",
             md.reset().convert(mdf.read_text()))
    readme = REPO / "README.md"
    if readme.exists():
        emit("readme", "sanafe_tpu — README",
             md.reset().convert(readme.read_text()))
    return written


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=str(DOCS / "_build"))
    ap.add_argument("--check", action="store_true",
                    help="build to a temp dir; nonzero exit on any error")
    args = ap.parse_args(argv)
    if args.check:
        with tempfile.TemporaryDirectory() as td:
            pages = build(Path(td))
            total = sum(p.stat().st_size for p in pages)
        print(f"docs check OK: {len(pages)} pages, {total / 1e3:.0f} KB")
        return 0
    pages = build(Path(args.out))
    print(f"built {len(pages)} pages -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
