import numpy as np
import pytest

from oatx.data.tokenizer import WordPieceTokenizer, basic_tokenize


@pytest.fixture(scope="module")
def bert_like_tokenizer():
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "the", "dog", "run", "##s", "jump", "##ing", "a", "cat", ",", "!",
             "un", "##believ", "##able"]
    return WordPieceTokenizer({w: i for i, w in enumerate(vocab)})


def test_basic_tokenize_lowercase_punct():
    assert basic_tokenize("The Dog, runs!") == ["the", "dog", ",", "runs", "!"]


def test_basic_tokenize_accents():
    assert basic_tokenize("café") == ["cafe"]


def test_wordpiece_greedy(bert_like_tokenizer):
    t = bert_like_tokenizer
    assert t.tokenize("runs") == ["run", "##s"]
    assert t.tokenize("jumping") == ["jump", "##ing"]
    assert t.tokenize("unbelievable") == ["un", "##believ", "##able"]
    assert t.tokenize("xyz") == ["[UNK]"]


def test_encode_specials_and_padding(bert_like_tokenizer):
    t = bert_like_tokenizer
    out = t(["the dog runs", "a cat"], max_length=8)
    ids, mask = out["input_ids"], out["attention_mask"]
    assert ids.shape == (2, 8)
    assert ids[0, 0] == t.cls_id
    # 'the dog runs' → the, dog, run, ##s → CLS + 4 + SEP = 6 tokens
    assert mask[0].sum() == 6
    assert ids[0, 5] == t.sep_id
    assert (ids[0, 6:] == t.pad_id).all()


def test_truncation(bert_like_tokenizer):
    out = bert_like_tokenizer(["the dog runs jumping the dog runs"], max_length=5)
    assert out["input_ids"].shape == (1, 5)
    assert out["input_ids"][0, -1] == bert_like_tokenizer.sep_id  # SEP preserved


def test_decode_roundtrip(bert_like_tokenizer):
    t = bert_like_tokenizer
    ids = t.encode("the dog runs")
    assert t.decode(ids) == "the dog runs"


def test_matches_hf_tokenizer_when_same_vocab(tmp_path):
    """Golden vs HF DistilBertTokenizer(Fast) on a shared synthetic vocab."""
    transformers = pytest.importorskip("transformers")
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "a", "the", "dog", "cat", "run", "##s", "jump", "##ing", "play",
             "in", "scene", "0", "1", "2", ",", ".", "!"]
    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(vocab) + "\n")

    hf = transformers.DistilBertTokenizer(str(vp), do_lower_case=True)
    mine = WordPieceTokenizer.from_vocab_file(str(vp))

    texts = ["The dog runs in scene 1!", "a cat jumping, playing.", "unknownword here"]
    for txt in texts:
        want = hf(txt, max_length=16, padding="max_length", truncation=True)
        got = mine([txt], max_length=16)
        np.testing.assert_array_equal(got["input_ids"][0], np.array(want["input_ids"]))
        np.testing.assert_array_equal(got["attention_mask"][0], np.array(want["attention_mask"]))


def test_build_from_corpus_covers_words():
    tok = WordPieceTokenizer.build_from_corpus(
        ["a dog runs", "a cat jumps", "dogs play"], vocab_size=256)
    out = tok(["a dog runs"], max_length=10)
    assert out["attention_mask"][0].sum() >= 5
    assert tok.token_length("dog") >= 1


def test_token_length(bert_like_tokenizer):
    assert bert_like_tokenizer.token_length("runs") == 2
    assert bert_like_tokenizer.token_length("the dog") == 2


def test_save_load_vocab_roundtrip(tmp_path, bert_like_tokenizer):
    t = bert_like_tokenizer
    p = t.save_vocab(str(tmp_path / "vocab.txt"))
    t2 = WordPieceTokenizer.from_vocab_file(p)
    assert t2.vocab == t.vocab
    assert t2(["the dog runs"], max_length=8)["input_ids"].tolist() == \
        t(["the dog runs"], max_length=8)["input_ids"].tolist()
