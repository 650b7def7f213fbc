"""WordPiece tokenization — greedy longest-match-first with ``##``
continuation pieces (Wu et al. 2016, the BERT tokenizer family).

Completes the tokenizer trio next to BPE (``functions/bpe.py``) and the
unigram LM (``functions/unigram.py``): three different vocabularies, one
encode discipline — vocab is BUILT distributed (bounded-domain partial
counts → one small groupby), then BROADCAST once (``ray.put`` via the plan
closure) into a stateless encode map. Encode is map-only; no shuffle.

The encoder is the real algorithm: per word, repeatedly take the LONGEST
vocab piece matching at the cursor (pieces after the first carry the ``##``
prefix), emitting ``[UNK]`` when no piece matches. Unlike BPE there is no
merge-order state — the vocab set alone determines the segmentation, which
is what makes a closed-form oracle possible for corpus-derived vocabs (see
``queries/quality_stats.py:q_wordpiece_encode``).
"""

from __future__ import annotations

UNK = "[UNK]"


def build_vocab(
    top_words: list[str], chars: set[str], bigrams: set[str]
) -> set[str]:
    """Assemble the piece set: whole-word tokens for the frequent words,
    single-char and char-bigram pieces (start and ``##`` continuation
    forms) for everything else — the standard coverage floor that keeps
    corpus-internal words UNK-free."""
    vocab: set[str] = set(top_words)
    for c in chars:
        vocab.add(c)
        vocab.add("##" + c)
    for b in bigrams:
        vocab.add(b)
        vocab.add("##" + b)
    return vocab


def encode_word(word: str, vocab: set[str], max_piece: int = 64) -> list[str]:
    """Greedy longest-match-first segmentation of one word."""
    if word in vocab:
        return [word]
    pieces: list[str] = []
    pos = 0
    n = len(word)
    while pos < n:
        end = min(n, pos + max_piece)
        found = None
        while end > pos:
            cand = word[pos:end]
            if pos > 0:
                cand = "##" + cand
            if cand in vocab:
                found = cand
                break
            end -= 1
        if found is None:
            return [UNK]  # whole-word UNK, per the reference algorithm
        pieces.append(found)
        pos = end
    return pieces
