"""Static documentation site generator — the mkdocs-material equivalent.

The reference ships an mkdocs site (``/root/reference/mkdocs.yml``) with
per-example acceptance pages and API reference pages
(``docs/zh/api/*.md``). mkdocs is not installable here (zero egress), so
this renders the same artifact with the stdlib + python-markdown:

  * every docs/*.md page (design, user guide, examples index)
  * the 65+ generated per-example metric pages (docs/examples/*.md)
  * an **API reference** generated from the live package: one page per
    public module, with class/function signatures and docstrings
  * a navigation sidebar on every page, all into ``site/``

Usage: python tools/gen_docs_site.py [--out site]
Exit status is nonzero on any render error — CI-gateable like
``mkdocs build --strict``.
"""

from __future__ import annotations

import argparse
import html
import importlib
import inspect
import os
import sys

import markdown

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

API_MODULES = [
    "paddlescience_tpu.arch",
    "paddlescience_tpu.autodiff.ad",
    "paddlescience_tpu.constraint.constraints",
    "paddlescience_tpu.data",
    "paddlescience_tpu.equation",
    "paddlescience_tpu.geometry",
    "paddlescience_tpu.loss",
    "paddlescience_tpu.loss.mtl",
    "paddlescience_tpu.metric",
    "paddlescience_tpu.optimizer",
    "paddlescience_tpu.optimizer.lr_scheduler",
    "paddlescience_tpu.solver.solver",
    "paddlescience_tpu.utils.config",
    "paddlescience_tpu.utils.symbolic",
    "paddlescience_tpu.validate",
    "paddlescience_tpu.visualize",
    "paddlescience_tpu.experimental",
    "paddlescience_tpu.probability",
    "paddlescience_tpu.deploy",
    "paddlescience_tpu.parallel.mesh",
    "paddlescience_tpu.parallel.distributed",
]

_CSS = """
body{font-family:system-ui,sans-serif;margin:0;display:flex;color:#222}
nav{width:270px;min-width:270px;background:#f4f6f8;padding:1rem;height:100vh;
overflow-y:auto;position:sticky;top:0;font-size:.9rem}
nav a{display:block;color:#205080;text-decoration:none;padding:.12rem 0}
nav a:hover{text-decoration:underline}
nav h3{margin:.8rem 0 .2rem;font-size:.8rem;text-transform:uppercase;color:#666}
main{padding:2rem 3rem;max-width:60rem;overflow-x:auto}
pre{background:#f6f8fa;padding:.8rem;overflow-x:auto;border-radius:6px}
code{background:#f6f8fa;padding:.1rem .25rem;border-radius:3px;font-size:.9em}
table{border-collapse:collapse}td,th{border:1px solid #ccc;padding:.3rem .6rem}
h1,h2{border-bottom:1px solid #eee;padding-bottom:.25rem}
.sig{background:#eef3f8;padding:.4rem .6rem;border-radius:4px;
font-family:monospace;white-space:pre-wrap;margin:.8rem 0 .2rem}
.doc{margin:.2rem 0 1rem 1rem;white-space:pre-wrap}
"""


def _render_page(title, body_html, nav_html, depth):
    pre = "../" * depth
    return f"""<!doctype html><html><head><meta charset="utf-8">
<title>{html.escape(title)} — paddlescience_tpu</title>
<style>{_CSS}</style></head><body>
<nav><h2><a href="{pre}index.html">paddlescience_tpu</a></h2>{nav_html}</nav>
<main>{body_html}</main></body></html>"""


def _md(text):
    return markdown.markdown(
        text, extensions=["tables", "fenced_code", "toc"], output_format="html5")


def _api_page(mod_name):
    mod = importlib.import_module(mod_name)
    parts = [f"<h1><code>{mod_name}</code></h1>"]
    if mod.__doc__:
        parts.append(f'<div class="doc">{html.escape(inspect.cleandoc(mod.__doc__))}</div>')
    public = getattr(mod, "__all__", None)
    if public is None:
        public = [n for n in vars(mod) if not n.startswith("_")]
    for name in public:
        obj = getattr(mod, name, None)
        if obj is None or inspect.ismodule(obj):
            continue
        if inspect.isclass(obj):
            try:
                sig = str(inspect.signature(obj.__init__)).replace("self, ", "").replace("(self)", "()")
            except (TypeError, ValueError):
                sig = "(...)"
            parts.append(f'<div class="sig">class {html.escape(name)}{html.escape(sig)}</div>')
            if obj.__doc__:
                parts.append(f'<div class="doc">{html.escape(inspect.cleandoc(obj.__doc__))}</div>')
            for mname, meth in sorted(vars(obj).items()):
                if mname.startswith("_") or not callable(meth):
                    continue
                try:
                    msig = str(inspect.signature(meth))
                except (TypeError, ValueError):
                    msig = "(...)"
                parts.append(f'<div class="sig" style="margin-left:1.5rem">.{html.escape(mname)}{html.escape(msig)}</div>')
                if getattr(meth, "__doc__", None):
                    parts.append(
                        f'<div class="doc" style="margin-left:2.5rem">{html.escape(inspect.cleandoc(meth.__doc__))}</div>')
        elif callable(obj):
            try:
                sig = str(inspect.signature(obj))
            except (TypeError, ValueError):
                sig = "(...)"
            parts.append(f'<div class="sig">def {html.escape(name)}{html.escape(sig)}</div>')
            if obj.__doc__:
                parts.append(f'<div class="doc">{html.escape(inspect.cleandoc(obj.__doc__))}</div>')
    return "\n".join(parts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(ROOT, "site"))
    args = ap.parse_args()
    out = args.out
    os.makedirs(out, exist_ok=True)
    os.makedirs(os.path.join(out, "examples"), exist_ok=True)
    os.makedirs(os.path.join(out, "api"), exist_ok=True)

    docs = os.path.join(ROOT, "docs")
    top_pages = sorted(f for f in os.listdir(docs) if f.endswith(".md"))
    ex_dir = os.path.join(docs, "examples")
    ex_pages = sorted(f for f in os.listdir(ex_dir) if f.endswith(".md")) if os.path.isdir(ex_dir) else []

    def nav(depth):
        pre = "../" * depth
        items = ["<h3>Guide</h3>"]
        items += [f'<a href="{pre}{p[:-3]}.html">{p[:-3].replace("_", " ")}</a>' for p in top_pages]
        items.append("<h3>API</h3>")
        items += [f'<a href="{pre}api/{m.replace(".", "_")}.html">{m.split("paddlescience_tpu.")[-1]}</a>'
                  for m in API_MODULES]
        items.append(f'<h3>Examples ({len(ex_pages)})</h3>')
        items += [f'<a href="{pre}examples/{p[:-3]}.html">{p[:-3]}</a>' for p in ex_pages]
        return "\n".join(items)

    n_pages = 0
    for p in top_pages:
        with open(os.path.join(docs, p)) as f:
            body = _md(f.read())
        with open(os.path.join(out, p[:-3] + ".html"), "w") as f:
            f.write(_render_page(p[:-3], body, nav(0), 0))
        n_pages += 1
    for p in ex_pages:
        with open(os.path.join(ex_dir, p)) as f:
            body = _md(f.read())
        with open(os.path.join(out, "examples", p[:-3] + ".html"), "w") as f:
            f.write(_render_page(p[:-3], body, nav(1), 1))
        n_pages += 1
    for m in API_MODULES:
        body = _api_page(m)
        with open(os.path.join(out, "api", m.replace(".", "_") + ".html"), "w") as f:
            f.write(_render_page(m, body, nav(1), 1))
        n_pages += 1

    # landing page = README
    with open(os.path.join(ROOT, "README.md")) as f:
        body = _md(f.read())
    with open(os.path.join(out, "index.html"), "w") as f:
        f.write(_render_page("paddlescience_tpu", body, nav(0), 0))
    n_pages += 1
    print(f"site: {n_pages} pages -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
