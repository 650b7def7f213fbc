"""Adversarial-input fuzz for the WordPiece + unigram-LM tokenizers
(r5 VERDICT item 8 — the codec mutation-fuzz treatment applied to
tokenizer training/encoding): empty vocab, all-OOV text, astral-plane
code points, empty corpora. Contract: raise-or-correct, never garbage."""

from __future__ import annotations

import random

import pyarrow as pa
import pytest
import ray


# ------------------------------------------------------------ WordPiece


class TestWordPieceFuzz:
    def test_empty_vocab_is_unk(self):
        from goose_parser_ray.functions.wordpiece import UNK, encode_word

        assert encode_word("hello", set()) == [UNK]

    def test_all_oov_word_is_whole_word_unk(self):
        from goose_parser_ray.functions.wordpiece import UNK, encode_word

        vocab = {"a", "##a", "b", "##b"}
        assert encode_word("xyz", vocab) == [UNK]
        # partial coverage still UNKs the WHOLE word (reference algorithm)
        assert encode_word("axz", vocab) == [UNK]

    def test_astral_plane_round_trip(self):
        from goose_parser_ray.functions.wordpiece import encode_word

        word = "a\U0001F701b\U00010348"
        vocab = set()
        for c in word:
            vocab.add(c)
            vocab.add("##" + c)
        pieces = encode_word(word, vocab)
        assert pieces[0][:2] != "##"
        assert all(p.startswith("##") for p in pieces[1:])
        joined = pieces[0] + "".join(p[2:] for p in pieces[1:])
        assert joined == word

    def test_greedy_invariants_fuzz(self):
        from goose_parser_ray.functions.wordpiece import UNK, encode_word

        rng = random.Random(7)
        alphabet = "abé\U0001F600"  # ASCII + combining-free BMP + astral
        for _ in range(300):
            word = "".join(
                rng.choice(alphabet) for _ in range(rng.randint(1, 8))
            )
            vocab = set()
            for _ in range(rng.randint(0, 10)):
                s = rng.randint(0, len(word) - 1)
                e = rng.randint(s + 1, len(word))
                piece = word[s:e]
                vocab.add(piece if s == 0 and rng.random() < 0.7
                          else "##" + piece)
            out = encode_word(word, vocab)
            if out == [UNK]:
                continue
            assert out[0][:2] != "##" or out[0] in vocab
            joined = out[0] + "".join(
                p[2:] if p.startswith("##") else p for p in out[1:]
            )
            assert joined == word


# ----------------------------------------------------------- unigram LM


class TestUnigramFuzz:
    def test_viterbi_concat_invariant_fuzz(self):
        import math

        from goose_parser_ray.functions.unigram import _viterbi_pieces

        rng = random.Random(11)
        alphabet = "xy\U00010348"
        for _ in range(200):
            word = "".join(
                rng.choice(alphabet) for _ in range(rng.randint(1, 7))
            )
            logp = {c: -2.0 for c in set(word)}
            for _ in range(rng.randint(0, 4)):
                s = rng.randint(0, len(word) - 1)
                e = rng.randint(s + 1, len(word))
                logp[word[s:e]] = -float(rng.randint(1, 5))
            pieces = _viterbi_pieces(word, logp)
            assert "".join(pieces) == word
            # deterministic: same inputs, same output
            assert _viterbi_pieces(word, dict(logp)) == pieces

    def test_viterbi_missing_chars_falls_back(self):
        from goose_parser_ray.functions.unigram import _viterbi_pieces

        # no piece covers the word -> documented fallback: per-char split
        assert _viterbi_pieces("abc", {"zz": -1.0}) == ["a", "b", "c"]

    def test_train_empty_corpus(self, ray_session):
        from goose_parser_ray.functions.unigram import unigram_train

        ds = ray.data.from_arrow(
            pa.table({"text": pa.array([], pa.string())})
        )
        try:
            vocab = unigram_train(ds, "text", vocab_size=16)
        except ValueError:
            return  # raise is acceptable per raise-or-correct
        assert vocab == [] or all(len(v) == 3 for v in vocab)

    def test_train_all_empty_strings(self, ray_session):
        from goose_parser_ray.functions.unigram import unigram_train

        ds = ray.data.from_arrow(pa.table({"text": ["", "", "  ", ""]}))
        try:
            vocab = unigram_train(ds, "text", vocab_size=16)
        except ValueError:
            return
        assert isinstance(vocab, list)

    def test_train_astral_corpus_round_trips(self, ray_session):
        from goose_parser_ray.functions.unigram import (
            _viterbi_pieces,
            unigram_train,
        )

        texts = ["\U0001F701\U0001F702 ab \U0001F701ab"] * 4
        ds = ray.data.from_arrow(pa.table({"text": texts}))
        vocab = unigram_train(ds, "text", vocab_size=24)
        assert vocab, "non-empty corpus must yield a vocabulary"
        logp = {p: lp / 1e6 for p, _, lp in vocab}
        for w in ["\U0001F701\U0001F702", "ab", "\U0001F701ab"]:
            assert "".join(_viterbi_pieces(w, logp)) == w
