"""First-party SentencePiece-unigram T5 tokenizer vs the HF `tokenizers`
Unigram model (external anchor, offline, synthetic vocab — same strategy as
test_tokenizer.py for CLIP).

Covers VERDICT r2 item 5: SD3 serving must run without transformers;
transformers/tokenizers stay TEST anchors only."""

import json
import os
import random
import struct

import numpy as np
import pytest

from stablediffusion_tpu.tokenizer.sentencepiece_unigram import (
    METASPACE,
    SentencePieceUnigramTokenizer,
    nmt_nfkc_normalize,
    parse_spiece_model,
)

MAXLEN = 32


def make_vocab():
    """T5-shaped unigram vocab: <pad>=0, </s>=1, <unk>=2, then scored
    pieces (ascii words, subwords, single chars, CJK, emoji)."""
    vocab = [("<pad>", 0.0), ("</s>", 0.0), ("<unk>", 0.0)]
    pieces = [
        METASPACE, METASPACE + "the", METASPACE + "a", METASPACE + "cat",
        METASPACE + "dog", METASPACE + "run", "ning", "s", "t", "h", "e",
        "c", "a", "o", "g", "n", "i", "r", "u",
        METASPACE + "photo", METASPACE + "of", METASPACE + "猫", "猫", "犬",
        METASPACE + "snow", "y", METASPACE + "mountain",
        METASPACE + "\U0001F600",
    ]
    rng = random.Random(0)
    for p in pieces:
        vocab.append((p, -rng.uniform(1.0, 10.0)))
    return vocab


CORPUS = [
    "the cat",
    "a dog running",
    "a photo of 猫",
    "snowy mountain \U0001F600",
    "  the   cat  ",          # extra whitespace collapse
    "the\tcat\ndog",          # NMT: tab/newline -> space
    "猫犬",
    "zebra!",                 # all-unknown chars -> fused <unk>
    "",
    "THE CAT",                # T5 does not lowercase
    "ｃａｔ",                  # NFKC fold of full-width latin
    "the cat " * 20,          # exceeds MAXLEN -> truncation
]


@pytest.fixture(scope="module")
def ours():
    return SentencePieceUnigramTokenizer(
        make_vocab(), unk_id=2, eos_id=1, pad_id=0, extra_ids=4
    )


@pytest.fixture(scope="module")
def anchor():
    """HF tokenizers Unigram configured to the same contract: NFKC +
    whitespace collapse, always-prefixed metaspace, eos template, fixed
    padding/truncation."""
    from tokenizers import (
        Regex,
        Tokenizer,
        models,
        normalizers,
        pre_tokenizers,
        processors,
    )

    tok = Tokenizer(models.Unigram(make_vocab(), unk_id=2, byte_fallback=False))
    tok.normalizer = normalizers.Sequence(
        [
            normalizers.NFKC(),
            normalizers.Replace(Regex(r"\s+"), " "),
            normalizers.Strip(),
        ]
    )
    tok.pre_tokenizer = pre_tokenizers.Metaspace(
        replacement=METASPACE, prepend_scheme="always"
    )
    tok.post_processor = processors.TemplateProcessing(
        single="$A </s>", special_tokens=[("</s>", 1)]
    )
    tok.enable_padding(pad_id=0, pad_token="<pad>", length=MAXLEN)
    tok.enable_truncation(max_length=MAXLEN)
    return tok


def test_anchor_token_id_equality(ours, anchor):
    for text in CORPUS:
        theirs = anchor.encode(text).ids
        mine = ours([text], max_length=MAXLEN)[0].tolist()
        assert mine == theirs, f"{text!r}: ours {mine} != hf {theirs}"


def test_batch_shape_and_dtype(ours):
    out = ours(CORPUS, max_length=MAXLEN)
    assert out.shape == (len(CORPUS), MAXLEN) and out.dtype == np.int32


def test_truncation_keeps_eos(ours):
    row = ours(["the cat " * 50], max_length=8)[0]
    assert row[-1] == ours.eos_id and len(row) == 8


def test_decode_roundtrip(ours):
    ids = ours.encode("a photo of 猫")
    assert ours.decode(ids) == "a photo of 猫"


def test_fused_unknowns(ours):
    # "zbra" chars are all absent from the vocab -> ONE fused <unk>
    ids = ours.tokenize_ids("zzzz")
    assert ids.count(ours.unk_id) == 1


def test_extra_id_sentinels(ours):
    # <extra_id_0> takes the HIGHEST id (T5 reverse-tail convention)
    ids = ours.tokenize_ids("the <extra_id_0> cat <extra_id_3>")
    assert ours.vocab_size - 1 in ids
    assert ours.vocab_size - 4 in ids
    assert ours.id_to_piece(ours.vocab_size - 1) == "<extra_id_0>"


def test_nmt_nfkc_normalize():
    assert nmt_nfkc_normalize("a​b­c") == "abc"  # zero-width/soft hyphen
    assert nmt_nfkc_normalize("a　b c") == "a b c"  # unicode spaces
    assert nmt_nfkc_normalize("\x07he\x00llo") == "hello"  # controls removed
    assert nmt_nfkc_normalize("ﬁne") == "fine"  # NFKC ligature fold
    assert nmt_nfkc_normalize("  a   b  ") == "a b"


# ---------------------------------------------------------------------------
# serialization loaders
# ---------------------------------------------------------------------------


def _write_spiece_model(path, vocab):
    """Independent ModelProto writer (wire format by hand): field 1 =
    repeated SentencePiece{piece=1, score=2, type=3}."""

    def varint(v):
        out = b""
        while True:
            b7 = v & 0x7F
            v >>= 7
            out += bytes([b7 | (0x80 if v else 0)])
            if not v:
                return out

    blob = b""
    for i, (piece, score) in enumerate(vocab):
        ptype = {0: 3, 1: 3, 2: 2}.get(i, 1)  # pad/eos CONTROL, unk UNKNOWN
        pb = piece.encode("utf-8")
        sub = (
            bytes([0x0A]) + varint(len(pb)) + pb          # field 1 string
            + bytes([0x15]) + struct.pack("<f", score)     # field 2 float
            + bytes([0x18]) + varint(ptype)                # field 3 enum
        )
        blob += bytes([0x0A]) + varint(len(sub)) + sub
    # trailer: an unrelated field (2, length-delimited TrainerSpec) the
    # parser must skip by wire type
    blob += bytes([0x12]) + varint(3) + b"xyz"
    with open(path, "wb") as f:
        f.write(blob)


def test_spiece_model_protobuf_roundtrip(tmp_path, ours):
    vocab = make_vocab()
    p = str(tmp_path / "spiece.model")
    _write_spiece_model(p, vocab)
    with open(p, "rb") as f:
        parsed = parse_spiece_model(f.read())
    assert [(p_, s) for p_, s, _ in parsed] == [
        (p_, pytest.approx(s, abs=1e-6)) for p_, s in vocab
    ]
    loaded = SentencePieceUnigramTokenizer.from_spiece_model(p, extra_ids=4)
    assert (loaded.pad_id, loaded.eos_id, loaded.unk_id) == (0, 1, 2)
    for text in CORPUS:
        assert loaded.tokenize_ids(text) == ours.tokenize_ids(text)


def test_from_pretrained_tokenizer_json(tmp_path, ours):
    d = tmp_path / "tokenizer_3"
    d.mkdir()
    spec = {
        "model": {"type": "Unigram", "unk_id": 2, "vocab": make_vocab()},
        "added_tokens": [
            {"id": 100 + k, "content": f"<extra_id_{k}>"} for k in range(4)
        ],
    }
    (d / "tokenizer.json").write_text(json.dumps(spec))
    loaded = SentencePieceUnigramTokenizer.from_pretrained(str(d))
    assert loaded.extra_ids == 4
    for text in CORPUS:
        assert loaded.tokenize_ids(text) == ours.tokenize_ids(text)


def test_from_tokenizer_json_sentinels_in_vocab(tmp_path, ours):
    """transformers' T5Converter APPENDS the sentinels to model.vocab when
    writing tokenizer.json (ids ... <extra_id_99>..<extra_id_0> at the
    tail); base=len(vocab) must not double-count them or <extra_id_0> maps
    past the embedding table."""
    d = tmp_path / "tokenizer_3"
    d.mkdir()
    base = make_vocab()
    n = len(base)
    vocab_with_sentinels = base + [
        [f"<extra_id_{3 - k}>", 0.0] for k in range(4)
    ]  # ids n..n+3 = <extra_id_3>..<extra_id_0> (reverse tail convention)
    spec = {
        "model": {
            "type": "Unigram", "unk_id": 2, "vocab": vocab_with_sentinels,
        },
        "added_tokens": [
            {"id": n + 3 - k, "content": f"<extra_id_{k}>"} for k in range(4)
        ],
    }
    (d / "tokenizer.json").write_text(json.dumps(spec))
    loaded = SentencePieceUnigramTokenizer.from_pretrained(str(d))
    assert loaded.extra_ids == 4
    assert loaded.vocab_size == n + 4  # NOT n + 8
    assert loaded.special_to_id["<extra_id_0>"] == n + 3
    assert loaded.special_to_id["<extra_id_3>"] == n
    for text in CORPUS:
        assert loaded.tokenize_ids(text) == ours.tokenize_ids(text)


def test_from_pretrained_prefers_spiece(tmp_path):
    d = tmp_path / "tok"
    d.mkdir()
    _write_spiece_model(str(d / "spiece.model"), make_vocab())
    (d / "tokenizer.json").write_text("not json")
    loaded = SentencePieceUnigramTokenizer.from_pretrained(str(d))
    assert loaded.pieces[1] == "</s>"
    with pytest.raises(FileNotFoundError):
        SentencePieceUnigramTokenizer.from_pretrained(str(tmp_path / "none"))


def test_sd3_pipeline_contract(ours):
    """Drop-in for io/loader.T5TokenizerAdapter: __call__(texts, max_length)
    -> fixed-shape int32, eos-terminated, pad-filled."""
    out = ours("a cat", max_length=16)
    assert out.shape == (1, 16)
    ids = out[0].tolist()
    n = ids.index(ours.eos_id)
    assert all(i == ours.pad_id for i in ids[n + 1 :])


def test_save_pretrained_roundtrip(tmp_path):
    """save_pretrained -> from_pretrained reproduces ids exactly for a
    spiece-derived vocab (mixed scripts, sentinels, unknown chars) — the
    serialization save_sd3_model relies on for self-loading folders."""
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    _write_spiece_model(str(src_dir / "spiece.model"), make_vocab())
    src = SentencePieceUnigramTokenizer.from_pretrained(str(src_dir))

    out_dir = tmp_path / "saved"
    src.save_pretrained(str(out_dir))
    loaded = SentencePieceUnigramTokenizer.from_pretrained(str(out_dir))

    assert loaded.vocab_size == src.vocab_size
    assert loaded.unk_id == src.unk_id
    assert loaded.eos_id == src.eos_id
    assert loaded.pad_id == src.pad_id
    for text in (
        "the cat running", "a photo of 猫", "snowy mountain \U0001F600",
        "zebra?!", "<extra_id_0> the <extra_id_99>",
    ):
        np.testing.assert_array_equal(
            src(text, max_length=24), loaded(text, max_length=24)
        )


def test_save_pretrained_extra_ids_zero_roundtrip(tmp_path):
    """A tokenizer with NO sentinels must reload with extra_ids=0: an
    explicitly-present-but-empty added_tokens list is authoritative (the
    old `len(added) or 100` silently re-added 100 sentinels, shifting
    vocab_size — advisor round-4 finding)."""
    tok = SentencePieceUnigramTokenizer(make_vocab(), extra_ids=0)
    out = tmp_path / "tok0"
    tok.save_pretrained(str(out))
    loaded = SentencePieceUnigramTokenizer.from_pretrained(str(out))
    assert loaded.extra_ids == 0
    assert loaded.vocab_size == tok.vocab_size
    for text in CORPUS:
        assert loaded.tokenize_ids(text) == tok.tokenize_ids(text)


def test_save_pretrained_nonstandard_controls_roundtrip(tmp_path):
    """Control pieces with non-T5 names (or extra control ids) round-trip
    exactly through the sdtpu metadata block, with an interchange warning
    (advisor round-4 finding: name-based recovery used to reset eos/pad to
    1/0 and made former control pieces matchable in raw text)."""
    import warnings

    vocab = [("[PAD]", 0.0), ("[STOP]", 0.0), ("<unk>", 0.0),
             ("[CTRL]", 0.0)]
    vocab += [(p, s) for p, s in make_vocab()[3:]]
    tok = SentencePieceUnigramTokenizer(
        vocab, unk_id=2, eos_id=1, pad_id=0, extra_ids=4,
        control_ids=(0, 1, 3),
    )
    out = tmp_path / "tokc"
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        tok.save_pretrained(str(out))
    assert any("control pieces" in str(x.message) for x in w)
    loaded = SentencePieceUnigramTokenizer.from_pretrained(str(out))
    assert loaded.eos_id == 1 and loaded.pad_id == 0
    assert loaded.control_ids == (0, 1, 3)
    # the [CTRL] control piece must NOT be matchable in raw text
    assert "[CTRL]" not in loaded.piece_to_id
    for text in ("the cat [CTRL] runs", "a dog"):
        assert loaded.tokenize_ids(text) == tok.tokenize_ids(text)


def test_save_pretrained_emits_hf_interchange_sections(tmp_path):
    """The emitted tokenizer.json carries version/normalizer/pre_tokenizer/
    decoder so a third-party HF `tokenizers` load applies NFKC + Metaspace
    instead of tokenizing raw text (advisor round-4 finding)."""
    out = tmp_path / "tokhf"
    SentencePieceUnigramTokenizer(make_vocab()).save_pretrained(str(out))
    spec = json.loads((out / "tokenizer.json").read_text())
    assert spec["version"] == "1.0"
    kinds = [n["type"] for n in spec["normalizer"]["normalizers"]]
    assert "NFKC" in kinds
    assert spec["pre_tokenizer"]["type"] == "Metaspace"
    assert spec["pre_tokenizer"]["replacement"] == METASPACE
    assert spec["decoder"]["type"] == "Metaspace"
    # standard T5-shaped controls: no interchange warning
    import warnings

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        SentencePieceUnigramTokenizer(make_vocab()).save_pretrained(
            str(tmp_path / "tokhf2"))
    assert not [x for x in w if "control pieces" in str(x.message)]
