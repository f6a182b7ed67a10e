from ragflow_spark.kernels.html_strip import html_main_content, html_to_sections

PAGE = """
<html><head><title>The Article Title</title><script>var x=1;</script></head>
<body>
<div class="navbar menu"><ul>
<li><a href="/a">home</a></li><li><a href="/b">news</a></li>
<li><a href="/c">sports</a></li><li><a href="/d">tech</a></li>
</ul></div>
<div class="sidebar"><a href="/x">promo one</a> <a href="/y">promo two</a></div>
<div class="article content">
<h1>The Article Title</h1>
<p>This is the first paragraph of the main content, with several commas, and
enough length to score as a real paragraph of text for the density model.</p>
<p>The second paragraph continues the body, also comma-rich, and long enough
to add to the candidate score of the containing article div.</p>
</div>
<div class="footer"><a href="/f1">terms</a><a href="/f2">privacy</a></div>
</body></html>
"""


def test_title_extracted():
    title, lines = html_main_content(PAGE)
    assert title == "The Article Title"


def test_main_content_kept_boilerplate_dropped():
    _, lines = html_main_content(PAGE)
    body = "\n".join(lines)
    assert "first paragraph of the main content" in body
    assert "second paragraph continues" in body
    assert "home" not in body  # nav link-farm
    assert "promo one" not in body  # sidebar
    assert "terms" not in body  # footer


def test_sections_contract():
    secs = html_to_sections(PAGE)
    # title first, then content lines, no empties
    assert secs[0] == "The Article Title"
    assert all(s.strip() for s in secs)


def test_malformed_html_degrades():
    secs = html_to_sections("<div><p>hello world this is fine")
    assert any("hello world" in s for s in secs)


def test_empty():
    assert html_to_sections("") == []
