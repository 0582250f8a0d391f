"""First-party CLIP BPE tokenizer.

The reference gets tokenization from HF `tokenizers`' Rust core via
CLIPTokenizer (models/stable_diffusion.py:128-135; pad-to-77 + truncation at
sd_unified_pipeline.py:583-589).  This is a standalone implementation of the
CLIP BPE scheme: byte-level-free word BPE over a lowercased, whitespace-
normalized text with the `</w>` end-of-word marker, vocab.json + merges.txt
files, bos/eos wrapping, truncation to max_length and right-padding.

SD1.5 / SDXL encoder-1 pad with the eos token (49407); SDXL encoder-2
(OpenCLIP) pads with token 0 — `pad_token_id` is a constructor argument.

Validated against transformers' CLIPTokenizer in tests/test_tokenizer.py.
"""

from __future__ import annotations

import html
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

try:
    import regex as re
except ImportError:  # pragma: no cover
    import re  # type: ignore

_PATTERN = re.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
    re.IGNORECASE,
)

_WHITESPACE = re.compile(r"\s+")

try:  # optional mojibake repair, as CLIP's basic_clean uses
    import ftfy
except ImportError:  # pragma: no cover
    ftfy = None

# -- pure-Python ftfy-equivalent mojibake repair ----------------------------
# CLIP's basic_clean runs ftfy.fix_text; when the library is absent we repair
# the dominant mojibake class ourselves: UTF-8 bytes mis-decoded as
# windows-1252/latin-1 ("Ã©" -> "é", "â€œ" -> '"', "ðŸ˜€" -> "😀").  The
# check is conservative by construction — a candidate repair is accepted ONLY
# if the re-encoded bytes decode as STRICT UTF-8 (legitimate accented words
# like "âme"/"Âge" re-encode to invalid UTF-8 and pass through untouched).
# ftfy also NFC-normalizes; we match that.

# windows-1252's 0x80-0x9F graphics; the five unmapped bytes (0x81 0x8D 0x8F
# 0x90 0x9D) fall back to the C1 controls like ftfy's sloppy-windows-1252,
# so "â€\x9d" (mis-decoded ") still round-trips
_C1_TO_CP1252 = {
    0x20AC: 0x80, 0x201A: 0x82, 0x0192: 0x83, 0x201E: 0x84, 0x2026: 0x85,
    0x2020: 0x86, 0x2021: 0x87, 0x02C6: 0x88, 0x2030: 0x89, 0x0160: 0x8A,
    0x2039: 0x8B, 0x0152: 0x8C, 0x017D: 0x8E, 0x2018: 0x91, 0x2019: 0x92,
    0x201C: 0x93, 0x201D: 0x94, 0x2022: 0x95, 0x2013: 0x96, 0x2014: 0x97,
    0x02DC: 0x98, 0x2122: 0x99, 0x0161: 0x9A, 0x203A: 0x9B, 0x0153: 0x9C,
    0x017E: 0x9E, 0x0178: 0x9F,
}


def _sloppy_cp1252_bytes(text: str) -> Optional[bytes]:
    """Inverse of a sloppy windows-1252 decode; None if any char can't have
    come from a single cp1252 byte."""
    out = bytearray()
    for ch in text:
        cp = ord(ch)
        if cp <= 0xFF:  # latin-1 range incl. C1 controls (sloppy fallback)
            out.append(cp)
        elif cp in _C1_TO_CP1252:
            out.append(_C1_TO_CP1252[cp])
        else:
            return None
    return bytes(out)


def _fix_segment(seg: str) -> str:
    raw = _sloppy_cp1252_bytes(seg)
    if raw is None or raw.isascii():
        return seg
    try:
        return raw.decode("utf-8")  # strict: invalid sequences -> no repair
    except UnicodeDecodeError:
        return seg


def fix_mojibake(text: str) -> str:
    """ftfy.fix_text-equivalent for the UTF-8-as-cp1252 class + NFC.

    Runs per whitespace-separated segment so CJK/emoji neighbours don't
    block repair of a mojibake word; iterates like ftfy to unwind doubly
    mis-decoded text."""
    for _ in range(3):
        if any(ord(c) > 0x7F for c in text):
            fixed = " ".join(_fix_segment(s) for s in text.split(" "))
        else:
            fixed = text
        if fixed == text:
            break
        text = fixed
    import unicodedata

    return unicodedata.normalize("NFC", text)


def _clean(text: str) -> str:
    # CLIP's basic_clean (ftfy when available, first-party repair otherwise)
    # + whitespace_clean
    text = ftfy.fix_text(text) if ftfy is not None else fix_mojibake(text)
    text = html.unescape(html.unescape(text))
    return _WHITESPACE.sub(" ", text).strip()


def _bytes_to_unicode() -> Dict[int, str]:
    """GPT-2/CLIP reversible byte -> printable-unicode table: BPE runs over
    UTF-8 *bytes*, so non-ASCII text (accents, CJK, emoji) never produces
    unknown symbols — matching transformers' CLIPTokenizer exactly."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(2**8):
        if b not in bs:
            bs.append(b)
            cs.append(2**8 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


class CLIPTokenizer:
    def __init__(
        self,
        vocab: Dict[str, int],
        merges: List[Tuple[str, str]],
        pad_token_id: Optional[int] = None,
        bos_token: str = "<|startoftext|>",
        eos_token: str = "<|endoftext|>",
        model_max_length: int = 77,
    ):
        self.vocab = vocab
        self.decoder = {v: k for k, v in vocab.items()}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.bos_token_id = vocab[bos_token]
        self.eos_token_id = vocab[eos_token]
        self.pad_token_id = self.eos_token_id if pad_token_id is None else pad_token_id
        self.model_max_length = model_max_length
        self.byte_encoder = _bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self._cache: Dict[str, List[str]] = {}
        # whole-string trigger tokens that bypass BPE (textual inversion):
        # lowercased trigger -> list of embedding-table ids (multi-vector
        # concepts map one trigger to several rows)
        self.added_tokens: Dict[str, List[int]] = {}
        # native C++ merge loop (ctypes) when compilable; silently falls back
        self._native = None
        try:
            from stablediffusion_tpu.tokenizer.bpe_native import NativeBPE, available

            if available():
                self._native = NativeBPE(vocab, merges)
        except Exception:
            self._native = None

    # -- constructors --------------------------------------------------------
    @classmethod
    def from_files(cls, vocab_file: str, merges_file: str, **kw) -> "CLIPTokenizer":
        with open(vocab_file, encoding="utf-8") as f:
            vocab = json.load(f)
        merges: List[Tuple[str, str]] = []
        with open(merges_file, encoding="utf-8") as f:
            for line in f.read().split("\n"):
                if not line or line.startswith("#version"):
                    continue
                a, b = line.split()
                merges.append((a, b))
        return cls(vocab, merges, **kw)

    @classmethod
    def from_pretrained(cls, path: str, **kw) -> "CLIPTokenizer":
        """Load from a diffusers-layout tokenizer folder."""
        cfg_path = os.path.join(path, "tokenizer_config.json")
        special_path = os.path.join(path, "special_tokens_map.json")
        pad_token_id = kw.pop("pad_token_id", None)
        if pad_token_id is None and os.path.exists(special_path):
            with open(special_path, encoding="utf-8") as f:
                special = json.load(f)
            pad = special.get("pad_token")
            if isinstance(pad, dict):
                pad = pad.get("content")
            if pad == "!":
                pad_token_id = 0
        return cls.from_files(
            os.path.join(path, "vocab.json"),
            os.path.join(path, "merges.txt"),
            pad_token_id=pad_token_id,
            **kw,
        )

    # -- BPE -----------------------------------------------------------------
    def _bpe(self, token: str) -> List[str]:
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        word: Tuple[str, ...] = tuple(token[:-1]) + (token[-1] + "</w>",)
        if len(word) == 1:
            self._cache[token] = list(word)
            return list(word)
        while True:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if best not in self.bpe_ranks:
                break
            a, b = best
            new_word: List[str] = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    new_word.append(a + b)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
        out = list(word)
        self._cache[token] = out
        return out

    def add_tokens(self, mapping: Dict[str, List[int]]) -> None:
        """Register textual-inversion triggers: whole-string matches that emit
        pre-assigned embedding ids instead of going through BPE."""
        self.added_tokens.update(
            {k.lower(): [int(i) for i in v] for k, v in mapping.items()}
        )

    def clear_added_tokens(self) -> None:
        self.added_tokens.clear()

    def save_pretrained(self, path: str) -> None:
        """Write a diffusers-layout tokenizer folder (inverse of
        from_pretrained): vocab.json + merges.txt + special_tokens_map.json.
        Added textual-inversion triggers are runtime state and are NOT saved
        (diffusers convention: TI embeddings live in their own files)."""
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "vocab.json"), "w", encoding="utf-8") as f:
            json.dump(self.vocab, f, ensure_ascii=False)
        merges = sorted(self.bpe_ranks.items(), key=lambda kv: kv[1])
        with open(os.path.join(path, "merges.txt"), "w", encoding="utf-8") as f:
            f.write("#version: 0.2\n")
            for (a, b), _ in merges:
                f.write(f"{a} {b}\n")
        special = {
            "bos_token": self.decoder[self.bos_token_id],
            "eos_token": self.decoder[self.eos_token_id],
        }
        if self.pad_token_id != self.eos_token_id:
            special["pad_token"] = self.decoder.get(self.pad_token_id, "!")
        with open(
            os.path.join(path, "special_tokens_map.json"), "w", encoding="utf-8"
        ) as f:
            json.dump(special, f, ensure_ascii=False)

    def tokenize(self, text: str) -> List[int]:
        text = _clean(text).lower()
        if self.added_tokens:
            import re as _re

            # word-ish boundaries so a trigger never fires inside a longer
            # word ("thing" must not match in "something")
            alts = "|".join(
                f"(?<![a-z0-9]){_re.escape(t)}(?![a-z0-9])"
                for t in sorted(self.added_tokens, key=len, reverse=True)
            )
            parts = _re.split(f"({alts})", text)
        else:
            parts = [text]
        ids: List[int] = []
        unk = self.vocab.get("<|endoftext|>")
        for part in parts:
            if part in self.added_tokens:
                ids.extend(self.added_tokens[part])
                continue
            for tok in _PATTERN.findall(part):
                # byte-level encode: BPE over UTF-8 bytes (reversible table)
                tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
                native_ids = self._tokenize_native(tok)
                if native_ids is not None:
                    ids.extend(native_ids)
                else:
                    for piece in self._bpe(tok):
                        ids.append(self.vocab.get(piece, unk))
        return ids

    def _tokenize_native(self, tok: str) -> Optional[List[int]]:
        if self._native is None:
            return None
        try:
            syms = [self.vocab[c] for c in tok[:-1]]
            syms.append(self.vocab[tok[-1] + "</w>"])
        except KeyError:  # unknown char -> python path handles unk
            return None
        return self._native.encode_word(syms)

    # -- pipeline API --------------------------------------------------------
    def __call__(
        self,
        texts: Sequence[str] | str,
        max_length: Optional[int] = None,
        padding: str = "max_length",
        truncation: bool = True,
    ) -> np.ndarray:
        """Batch encode to int32 [B, max_length] — pad-to-max + truncate, the
        reference's invocation (sd_unified_pipeline.py:583-589)."""
        if isinstance(texts, str):
            texts = [texts]
        max_length = max_length or self.model_max_length
        rows = []
        for t in texts:
            ids = self.tokenize(t)
            if truncation and len(ids) > max_length - 2:
                ids = ids[: max_length - 2]
            row = [self.bos_token_id] + ids + [self.eos_token_id]
            if padding == "max_length" and len(row) < max_length:
                row = row + [self.pad_token_id] * (max_length - len(row))
            rows.append(row)
        return np.asarray(rows, dtype=np.int32)

    def decode(self, ids: Sequence[int]) -> str:
        toks = [
            self.decoder.get(int(i), "")
            for i in ids
            if int(i) not in (self.bos_token_id, self.pad_token_id)
        ]
        text = "".join(t for t in toks if t != "<|endoftext|>")
        try:
            data = bytearray(self.byte_decoder[c] for c in text)
            text = data.decode("utf-8", errors="replace")
        except KeyError:  # non-byte-level vocab (test fixtures)
            pass
        return text.replace("</w>", " ").strip()
