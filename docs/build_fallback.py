#!/usr/bin/env python
"""Dependency-free docs builder (fallback when sphinx is unavailable).

Renders the Markdown tree under ``source/`` to static HTML in
``build/html``, mirroring the directory layout and rewriting ``.md`` links
to ``.html``.  Covers the subset of Markdown these docs use: ATX headings,
fenced code blocks, inline code, bold/italic, links, images, ordered and
unordered lists, tables, blockquotes, and horizontal rules.  Full-featured
builds use sphinx + myst-parser (the ``docs`` extra in pyproject.toml);
this fallback exists so the docs build succeeds in hermetic environments.
"""

import html
import os
import re
import shutil
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "source")
OUT = os.path.join(HERE, "build", "html")

_CSS = """
body { max-width: 52rem; margin: 2rem auto; padding: 0 1rem;
       font: 16px/1.55 system-ui, sans-serif; color: #1a1a1a; }
pre { background: #f6f8fa; padding: .8rem 1rem; overflow-x: auto;
      border-radius: 6px; font-size: 86%; }
code { background: #f6f8fa; padding: .1em .3em; border-radius: 4px;
       font-size: 90%; }
pre code { background: none; padding: 0; }
table { border-collapse: collapse; margin: 1rem 0; }
th, td { border: 1px solid #d0d7de; padding: .35rem .7rem; }
th { background: #f6f8fa; }
blockquote { border-left: 4px solid #d0d7de; margin-left: 0;
             padding-left: 1rem; color: #555; }
a { color: #0757ba; }
h1, h2, h3 { line-height: 1.25; }
nav { font-size: 90%; margin-bottom: 1.5rem; }
"""


def _inline(s):
    s = html.escape(s, quote=False)
    s = re.sub(r"`([^`]+)`", lambda m: "<code>%s</code>" % m.group(1), s)
    s = re.sub(r"!\[([^\]]*)\]\(([^)]+)\)", r'<img alt="\1" src="\2">', s)

    def _link(m):
        target = m.group(2)
        if not target.startswith(("http://", "https://", "#", "mailto:")):
            target = re.sub(r"\.md(#.*)?$", r".html\1", target)
        return '<a href="%s">%s</a>' % (target, m.group(1))

    s = re.sub(r"\[([^\]]+)\]\(([^)]+)\)", _link, s)
    s = re.sub(r"\*\*([^*]+)\*\*", r"<strong>\1</strong>", s)
    s = re.sub(r"(?<![\w*])\*([^*\s][^*]*)\*(?![\w*])", r"<em>\1</em>", s)
    return s


def render(md):
    out = []
    lines = md.splitlines()
    i = 0
    in_list = None           # "ul" | "ol" | None
    while i < len(lines):
        line = lines[i]
        fence = re.match(r"^```(\{?[\w-]*\}?)\s*$", line)
        if fence:
            body = []
            i += 1
            while i < len(lines) and not lines[i].startswith("```"):
                body.append(lines[i])
                i += 1
            i += 1
            if fence.group(1) == "{toctree}":
                # MyST toctree directive: render as a contents list
                entries = [b.strip() for b in body
                           if b.strip() and not b.strip().startswith(":")]
                out.append("<ul class='toctree'>%s</ul>" % "".join(
                    '<li><a href="%s.html">%s</a></li>' % (e, e)
                    for e in entries))
            else:
                out.append("<pre><code>%s</code></pre>"
                           % html.escape("\n".join(body)))
            continue
        if in_list and not re.match(r"^\s*([-*+]|\d+\.)\s+", line):
            out.append("</%s>" % in_list)
            in_list = None
        h = re.match(r"^(#{1,6})\s+(.*)$", line)
        if h:
            n = len(h.group(1))
            out.append("<h%d>%s</h%d>" % (n, _inline(h.group(2)), n))
        elif re.match(r"^(\s*[-*_]){3,}\s*$", line) and "|" not in line:
            out.append("<hr>")
        elif line.startswith("|") and i + 1 < len(lines) \
                and re.match(r"^\|[\s:|-]+\|?\s*$", lines[i + 1]):
            head = [c.strip() for c in line.strip("|").split("|")]
            out.append("<table><tr>%s</tr>"
                       % "".join("<th>%s</th>" % _inline(c) for c in head))
            i += 2
            while i < len(lines) and lines[i].startswith("|"):
                cells = [c.strip() for c in lines[i].strip("|").split("|")]
                out.append("<tr>%s</tr>" % "".join(
                    "<td>%s</td>" % _inline(c) for c in cells))
                i += 1
            out.append("</table>")
            continue
        elif re.match(r"^\s*[-*+]\s+", line) or re.match(r"^\s*\d+\.\s+", line):
            kind = "ul" if re.match(r"^\s*[-*+]\s+", line) else "ol"
            if in_list != kind:
                if in_list:
                    out.append("</%s>" % in_list)
                out.append("<%s>" % kind)
                in_list = kind
            item = re.sub(r"^\s*([-*+]|\d+\.)\s+", "", line)
            out.append("<li>%s</li>" % _inline(item))
        elif line.startswith(">"):
            out.append("<blockquote>%s</blockquote>"
                       % _inline(line.lstrip("> ")))
        elif line.strip():
            out.append("<p>%s</p>" % _inline(line))
        i += 1
    if in_list:
        out.append("</%s>" % in_list)
    return "\n".join(out)


def build():
    if os.path.isdir(OUT):
        shutil.rmtree(OUT)
    pages = []
    for root, _dirs, files in os.walk(SRC):
        for name in sorted(files):
            src_path = os.path.join(root, name)
            rel = os.path.relpath(src_path, SRC)
            if name.endswith(".md"):
                pages.append(rel)
            elif not name.endswith(".py"):
                dst = os.path.join(OUT, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.copy2(src_path, dst)
    for rel in pages:
        with open(os.path.join(SRC, rel)) as f:
            md = f.read()
        depth = rel.count(os.sep)
        home = "../" * depth + "index.html"
        title = rel
        m = re.search(r"^#\s+(.+)$", md, re.M)
        if m:
            title = m.group(1)
        page = ("<!doctype html><meta charset='utf-8'>"
                "<title>%s</title><style>%s</style>"
                "<nav><a href='%s'>fvgp_tpu docs</a></nav>\n%s"
                % (html.escape(title), _CSS, home, render(md)))
        dst = os.path.join(OUT, re.sub(r"\.md$", ".html", rel))
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        with open(dst, "w") as f:
            f.write(page)
    print("fallback docs build: %d pages -> %s" % (len(pages), OUT))
    return 0


if __name__ == "__main__":
    sys.exit(build())
