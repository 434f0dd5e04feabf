"""Runtime loading of the reference corpus/sample text (data, not code)."""

from pathlib import Path

import pytest

from nerf_attention_tpu import reference_data

HAVE_REFERENCE = (Path("/root/reference") / "nerf_attention").is_dir()


def _fresh(monkeypatch, root: str):
    monkeypatch.setenv("NERF_REFERENCE_ROOT", root)
    reference_data.load_reference_prompts.cache_clear()
    reference_data.load_reference_sample_text.cache_clear()


@pytest.fixture(autouse=True)
def _clear_caches():
    yield
    reference_data.load_reference_prompts.cache_clear()
    reference_data.load_reference_sample_text.cache_clear()


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference checkout not mounted")
def test_reference_prompts_load_verbatim():
    corpus = reference_data.load_reference_prompts()
    assert corpus is not None
    assert set(corpus) == {"fiction", "code", "conversational", "technical"}
    # The texts are the reference's, repeated to context-filling length.
    assert all(len(text) > 4000 for text in corpus.values())


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference checkout not mounted")
def test_reference_sample_text_loads():
    text = reference_data.load_reference_sample_text()
    assert text is not None and len(text) > 2000


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference checkout not mounted")
def test_get_prompts_and_sample_text_prefer_reference(monkeypatch):
    from nerf_attention_tpu.experiments.prompts import ALL_PROMPTS, get_prompts
    from nerf_attention_tpu.extract import get_sample_text

    corpus = get_prompts()
    assert corpus is not None and corpus != ALL_PROMPTS
    assert get_sample_text() == reference_data.load_reference_sample_text()


def test_fallback_when_reference_absent(monkeypatch, tmp_path):
    from nerf_attention_tpu.experiments.prompts import ALL_PROMPTS, get_prompts

    _fresh(monkeypatch, str(tmp_path / "nope"))
    assert reference_data.reference_root() is None
    assert reference_data.load_reference_prompts() is None
    assert reference_data.load_reference_sample_text() is None
    assert get_prompts() == ALL_PROMPTS


def test_loader_rejects_executable_corpus(monkeypatch, tmp_path):
    """A corpus file containing code (not data) must not be evaluated."""
    fake = tmp_path / "nerf_attention" / "experiments"
    fake.mkdir(parents=True)
    (fake / "prompts.py").write_text(
        "import os\n"
        "EVIL = os.getcwd()\n"
        "FICTION = 'ok' * 3\n"
        "ALL_PROMPTS = {'fiction': FICTION, 'evil': EVIL}\n"
    )
    _fresh(monkeypatch, str(tmp_path))
    # EVIL can't be evaluated -> ALL_PROMPTS references an unknown name ->
    # whole corpus rejected, fallback used.
    assert reference_data.load_reference_prompts() is None


def test_loader_accepts_pure_data_corpus(monkeypatch, tmp_path):
    fake = tmp_path / "nerf_attention" / "experiments"
    fake.mkdir(parents=True)
    (fake / "prompts.py").write_text(
        'FICTION = ("a story " "told twice ") * 2\n'
        'CODE = "x = 1\\n" * 3\n'
        "ALL_PROMPTS = {'fiction': FICTION, 'code': CODE}\n"
    )
    _fresh(monkeypatch, str(tmp_path))
    corpus = reference_data.load_reference_prompts()
    assert corpus == {
        "fiction": "a story told twice " * 2,
        "code": "x = 1\nx = 1\nx = 1\n",
    }
