#!/usr/bin/env python3
"""Generate golden fixtures for the tolerant HTML text extractor (F2 strict).

The reference strips HTML with BeautifulSoup (synth/utils.py:69-87). No
HTML library ships in the Spark-side container, so the strict Scala
extractor (graft/functions/HtmlText.scala) is pinned against the PYTHON
STANDARD LIBRARY's tolerant tokenizer — `html.parser.HTMLParser`, one of
BeautifulSoup's own backends: text = concatenated data nodes, character
references decoded, comments/declarations/PIs dropped, script/style
content passed through raw.

Writes src/test/resources/html_text_goldens.tsv as base64(html) TAB
base64(text) so embedded tabs/newlines survive. Driver-side tooling only;
re-run if cases are added.
"""
import base64
from html.parser import HTMLParser
from pathlib import Path


class TextExtractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.parts = []

    def handle_data(self, data):
        self.parts.append(data)


def extract(html: str) -> str:
    p = TextExtractor()
    p.feed(html)
    p.close()
    return "".join(p.parts)


CASES = [
    "plain text, no markup at all",
    "Iron <i>maiden</i>s",                         # no separator at tag joins
    "a<br>b<br/>c<BR />d",
    '<a href="x" title="a>b">link</a> tail',       # '>' inside quoted attr
    "<a title='3<4'>q</a>",                        # '<' inside quoted attr
    "<div class=unquoted attr2>body</div>",
    "x <!-- a comment with -- and <p> inside --> y",
    "<!DOCTYPE html><p>doc</p>",
    "<?xml version='1.0'?>pi tail",
    '<script>if(a<b){s="<p>no tag";}</script>after',
    "<style>p > span { color: red }</style>css tail",
    "<script>a &amp; b</script>",                  # raw text: no decode
    "A &amp; B &lt;tag&gt; &quot;q&quot; &#39;s&#39;",
    "caf&eacute; &mdash; r&eacute;sum&eacute;",
    "&#65;&#x42;&#X43; &#8212;",
    "nb&nbsp;sp",                                  # decodes to \xa0
    "unknown &foobar; stays",
    "3 < 4 and 5 > 2",                             # bare < before space is data
    "deep <b><i><u>nesting</u></i></b> flat",
    "unclosed <b>bold then <i>italic",
    "<p>para1</p>\n<p>para2</p>",
    "tabs\tand\r\nnewlines <em>kept</em>",
    "<td>cell1</td><td>cell2</td>",
    "mixed &amp;&amp;&amp; runs",
    "trailing entity &mdash;",
    "<span>&#x1F600;</span> emoji ref",            # astral charref
    "empty tags <p></p><div></div> only",
    "<ul><li>one</li><li>two</li></ul>",
    "attr entity <a title=\"&amp;\">t</a>",
    "&Agrave; &Uuml; &szlig; &ccedil;",
    "&alpha;&beta;&gamma; greek",
    "<h1>Title</h1>Body text <small>fine</small>.",
    # raw-text close-tag NAME BOUNDARY: </scripted> is script data, the
    # element ends only at a real </script>
    "<script>x</scripted>y</script>z",
    "<style>a</styled>b</style>c",
    # whitespace between </ and the name still closes (stdlib endtagfind)
    "<style>a</ style>b",
    "<script>q</SCRIPT >tail",
    # an end tag CARRYING ATTRIBUTES fails endtagfind — html.parser stays
    # in cdata mode, so the element ends only at the next bare close
    '<script>x</script foo="bar">y</script>z',
    "<style>p{}</style media=screen>q</style>r",
    # attribute-bearing close with no real close after — and unterminated
    # cdata generally: html.parser holds the body pending and close()
    # DROPS it, so nothing is emitted
    '<script>a</script foo>b',
    "<script>abc",
    "before<style>x",
]


def main():
    out = Path(__file__).resolve().parent.parent / "src/test/resources/html_text_goldens.tsv"
    out.parent.mkdir(parents=True, exist_ok=True)
    lines = []
    for html in CASES:
        text = extract(html)
        b64 = lambda s: base64.b64encode(s.encode("utf-8")).decode("ascii")
        lines.append(f"{b64(html)}\t{b64(text)}")
        print(repr(html), "->", repr(text))
    out.write_text("\n".join(lines) + "\n")
    print(f"\n{len(CASES)} cases -> {out}")


if __name__ == "__main__":
    main()
