"""Kernel tests for the model-fronted chunker family (picture/audio/
resume doc assembly, kernels/media_docs.py) — semantics mirrored from
rag/app/picture.py / audio.py / resume.py."""

from ragflow_spark.functions.trie_tokenizer import tokenize
from ragflow_spark.kernels.media_docs import (
    AUDIO_EXTS,
    RESUME_FIELD_MAP,
    audio_doc,
    picture_doc,
    resume_doc,
    rm_space,
)


def test_picture_long_ocr_skips_cv():
    d = picture_doc("img_7.jpg", "word " * 40)
    assert d["docnm_kwd"] == "img_7.jpg"
    assert d["title_tks"] == "img_7"
    assert d["doc_type_kwd"] == "image"
    assert d["content_with_weight"].startswith("word word")
    assert d["content_ltks"].split()[0] == "word"


def test_picture_char_branch():
    # 3 words but >32 chars: the non-english clause fires even with few words
    txt = "aaaaaaaaaaaa bbbbbbbbbbbb cccccccccccc"
    assert picture_doc("p.png", txt, is_english=True) is not None


def test_picture_short_without_model_is_empty():
    assert picture_doc("img.jpg", "tiny text") is None


def test_picture_cv_route_appends_caption():
    d = picture_doc("img.jpg", "tiny", describe=lambda f, t: "photo of cat")
    assert d["content_with_weight"] == "tiny\nphoto of cat"
    assert d["content_ltks"].endswith("photo of cat")


def test_picture_cv_failure_is_empty():
    def boom(f, t):
        raise RuntimeError("no model")

    assert picture_doc("img.jpg", "tiny", describe=boom) is None


def test_audio_extension_gate():
    assert audio_doc("a.xyz", "text") is None
    assert audio_doc("noextension", "text") is None
    assert audio_doc("a.WAV", "text") is not None  # case-insensitive
    assert ".mp3" in AUDIO_EXTS


def test_audio_doc_fields():
    d = audio_doc("rec_42.wav", "hello worlds")
    assert d["title_tks"] == "rec_42"
    assert d["title_sm_tks"] == "rec_42"
    # en_normalize strips the plural in content_ltks
    assert d["content_ltks"] == "hello world"
    assert d["content_with_weight"] == "hello worlds"


def test_audio_no_transcription_is_empty():
    assert audio_doc("rec.wav", None) is None


def test_audio_mp3_title_keeps_extension():
    # the reference's title-strip regex is [a-zA-Z]-only, so digit-bearing
    # extensions like .mp3 survive into the title tokens
    d = audio_doc("rec_7.mp3", "hello")
    assert d["title_tks"] == "rec_7 mp3"
    assert d["title_sm_tks"] == "rec_7 mp3"


def _parsed(**over):
    base = {
        "name_kwd": "zhang",
        "gender_kwd": "男",
        "age_int": 25,
        "phone_kwd": "13800000001",
        "email_tks": "a@b.com",
        "position_name_tks": "data engineer",
        "work_exp_flt": 3.5,
        "corporation_name_tks": "acme corp",
        "first_school_name_tks": "mit",
        "first_degree_kwd": "本科",
    }
    base.update(over)
    return base


def test_resume_title_composition():
    d = resume_doc("r.pdf", _parsed())
    # name-gender-position-age-简历 through the tokenizer
    assert d["title_tks"] == "zhang 男 datum engineer 25 简 历"  # data→datum: r5 irregular-lemma fold (reference lemmatizer parity)
    assert d["docnm_kwd"] == "r.pdf"


def test_resume_label_paren_strip_fullwidth_only():
    d = resume_doc("r.pdf", _parsed())
    lines = d["content_with_weight"].split("\n")
    assert "性别: 男" in lines  # （男，女） stripped
    # half-width parens survive (the reference strips full-width only)
    assert any(ln.startswith("最近就职(上班)的公司") for ln in lines)
    # lines follow field-map order
    assert lines[0].startswith("姓名/名字: ")


def test_resume_parse_failure_contract():
    assert resume_doc("r.pdf", {"name_kwd": "x", "age_int": 3}) is None


def test_resume_list_collapse_and_forbidden():
    d = resume_doc(
        "r.pdf",
        _parsed(
            corp_nm_tks=["acme corp", "beta inc"],  # collapses to first
            degree_kwd=["本科", "硕士"],  # forbidden-select: stays a list
        ),
    )
    assert d["corp_nm_tks"] == "acme corp"
    assert d["degree_kwd"] == ["本科", "硕士"]


def test_resume_tks_fields_fine_grained():
    d = resume_doc("r.pdf", _parsed(email_tks="a@b.com"))
    # non-[a-z_-] tokens pass en_normalize unchanged
    assert d["email_tks"] == "a@b.com"
    # pairs rendering rm_spaces double spaces
    d2 = resume_doc("r.pdf", _parsed(position_name_tks="data  engineer"))
    assert "职位/职能/岗位/职责: data engineer" in d2["content_with_weight"]


def test_rm_space():
    assert rm_space("a  b") == "a b"
    assert rm_space("词 语") == "词语"


def test_oracle_token_constants():
    """The chunk_resume oracle embeds these dictionary-dependent literals;
    if the vendored dict changes they must be re-derived."""
    assert tokenize("简历") == "简 历"
    assert tokenize("男") == "男"
    assert tokenize("女") == "女"
    assert tokenize("img_123") == "img_123"
    assert tokenize("rec_42") == "rec_42"
    assert len(RESUME_FIELD_MAP) == 25


def test_clean_markdown_block_and_vision_doc():
    from ragflow_spark.kernels.media_docs import (
        clean_markdown_block,
        vision_llm_doc,
    )

    assert clean_markdown_block("```markdown\n# t\nbody\n```") == "# t\nbody"
    assert clean_markdown_block("no fence") == "no fence"
    assert vision_llm_doc("i.jpg") == ""
    assert vision_llm_doc("i.jpg", lambda f: "```markdown\nx\n```") == "\nx"

    def boom(f):
        raise RuntimeError("no model")

    assert vision_llm_doc("i.jpg", boom) == ""
