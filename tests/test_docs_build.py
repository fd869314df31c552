"""Docs build gate (VERDICT r3 #4): the CI-style command
``python tools/build_docs.py`` must regenerate the API reference and
render the full HTML site without errors, and the site must have no
broken internal links."""

import glob
import html.parser
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUILD = os.path.join(REPO, "docs", "_build", "html")


class _LinkParser(html.parser.HTMLParser):
    def __init__(self):
        super().__init__()
        self.links = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            for k, v in attrs:
                if k == "href":
                    self.links.append(v)


@pytest.mark.slow
def test_docs_build_clean_and_linked():
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    r = subprocess.run([sys.executable, os.path.join(REPO, "tools", "build_docs.py")],
                       capture_output=True, text=True, timeout=600, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ERROR rendering" not in r.stderr

    api_pages = glob.glob(os.path.join(REPO, "docs", "api", "*.md"))
    assert len(api_pages) >= 50      # one per public class + grouped pages
    # every public top-level class has a page
    import optrace_tpu as ot
    import inspect
    for n in dir(ot):
        if not n.startswith("_") and inspect.isclass(getattr(ot, n)):
            assert os.path.exists(os.path.join(REPO, "docs", "api", f"{n}.md")), n

    pages = glob.glob(os.path.join(BUILD, "**", "*.html"), recursive=True)
    assert len(pages) >= 80
    broken = []
    for pg in pages:
        p = _LinkParser()
        p.feed(open(pg).read())
        base = os.path.dirname(pg)
        for link in p.links:
            if link.startswith(("http", "#", "mailto")):
                continue
            tgt = os.path.normpath(os.path.join(base, link.split("#")[0]))
            if not os.path.exists(tgt):
                broken.append((pg, link))
    assert not broken, broken[:10]
