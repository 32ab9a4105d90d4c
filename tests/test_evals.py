"""Hermetic end-to-end tests of the eval harness: fabricated local model dir
(weights + tokenizer) + fabricated task data -> runner -> scorer."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    from fastkv_tpu.utils.testing import make_tiny_model_dir

    return make_tiny_model_dir(str(tmp_path_factory.mktemp("model")))


def small_engine_args(model_dir, save_dir, data_dir, **over):
    import argparse

    ns = argparse.Namespace(
        model_path=model_dir, method="fastkv", window_size=4, kernel_size=5,
        pooling="maxpool", eviction_mode="proportional", max_capacity_prompts=64,
        tsp_len=64, retain_rate=0.25, tsp_rate=0.5, tsp_idx=0, filter_idx=0,
        dtype="float32", use_pallas=False, tp=1, dp=1,
        data_dir=data_dir, save_dir=save_dir, max_num_examples=2,
    )
    for k, v in over.items():
        setattr(ns, k, v)
    return ns


def test_weights_loader_roundtrip(model_dir):
    from fastkv_tpu.core.weights import load_params, model_config_from_dir

    cfg = model_config_from_dir(model_dir, dtype="float32")
    params = load_params(model_dir, cfg)
    assert params["layers"]["wq"].shape == (cfg.num_layers, 64, 64)
    assert params["lm_head"].shape == (64, cfg.vocab_size)


def test_longbench_run_and_score(model_dir, tmp_path):
    from transformers import AutoTokenizer

    from fastkv_tpu.evals import longbench

    data_dir = tmp_path / "LongBench"
    data_dir.mkdir()
    examples = [
        {
            "input": "What is the best thing to do?",
            "context": "The quick brown fox jumps over the lazy dog. " * 30,
            "answers": ["eat a sandwich"],
            "length": 300,
            "dataset": "multifieldqa_en",
            "language": "en",
            "all_classes": None,
            "_id": f"id{i}",
        }
        for i in range(2)
    ]
    with open(data_dir / "multifieldqa_en.jsonl", "w") as f:
        for ex in examples:
            f.write(json.dumps(ex) + "\n")

    save_dir = str(tmp_path / "results")
    args = small_engine_args(model_dir, save_dir, str(data_dir), datasets="multifieldqa_en")
    tokenizer = AutoTokenizer.from_pretrained(model_dir)
    engine, _ = longbench.build_engine(args)
    longbench.run_task(engine, tokenizer, args, "multifieldqa_en")

    out = os.path.join(save_dir, "multifieldqa_en", "fastkv.json")
    assert os.path.exists(out)
    recs = [json.loads(l) for l in open(out)]
    assert len(recs) == 2
    assert set(recs[0]) >= {"prompt", "input", "context", "answers", "pred", "length",
                            "dataset", "language", "all_classes", "_id"}

    rows = longbench.score_results_dir(save_dir, ["multifieldqa_en"])
    by_method = {r[0]: r[1] for r in rows[1:]}
    assert isinstance(by_method["fastkv"], float)
    assert by_method["fullkv"] == -1  # missing methods tolerated
    assert os.path.exists(os.path.join(save_dir, "results.csv"))


def test_ruler_run_and_score(model_dir, tmp_path):
    from transformers import AutoTokenizer

    from fastkv_tpu.evals import ruler

    data_dir = tmp_path / "RULER"
    (data_dir / "4096").mkdir(parents=True)
    with open(data_dir / "4096" / "niah_single_1.jsonl", "w") as f:
        for i in range(2):
            f.write(json.dumps({
                "index": str(i),
                "input": "A magic number is hidden. " * 20 + " What is it?",
                "outputs": "['42']",  # stringified list, as in vendored data
                "length": "200",
            }) + "\n")

    save_dir = str(tmp_path / "results")
    args = small_engine_args(model_dir, save_dir, str(data_dir),
                             datasets="niah_single_1", context_length=4096)
    tokenizer = AutoTokenizer.from_pretrained(model_dir)
    from fastkv_tpu.evals.longbench import build_engine

    engine, _ = build_engine(args)
    ruler.run_task(engine, tokenizer, args, "niah_single_1")
    recs = [json.loads(l) for l in open(os.path.join(save_dir, "niah_single_1", "fastkv.json"))]
    assert recs[0]["answers"] == ["42"]  # literal_eval'd into a real list

    rows = ruler.score_results_dir(save_dir)
    by_method = {r[0]: r[1] for r in rows[1:]}
    assert isinstance(by_method["fastkv"], float)


def test_needle_build_and_resume(model_dir, tmp_path):
    from transformers import AutoTokenizer

    from fastkv_tpu.evals import needle

    hay = tmp_path / "essays"
    hay.mkdir()
    (hay / "a.txt").write_text("The dog runs in the park.\n" * 200)

    tokenizer = AutoTokenizer.from_pretrained(model_dir)
    toks = needle.read_haystack(str(hay), tokenizer, 400)
    ctx = needle.build_context(toks, tokenizer, 400, 50)
    assert "Dolores Park" in ctx

    save_dir = str(tmp_path / "results")
    os.makedirs(save_dir)
    rec = {"model": "m", "context_length": 400, "depth_percent": 50.0, "version": 1}
    with open(os.path.join(save_dir, "m_len_400_depth_5000_results.json"), "w") as f:
        json.dump(rec, f)
    assert needle.result_exists(save_dir, "m", 400, 50.0)
    assert not needle.result_exists(save_dir, "m", 800, 50.0)


def test_metric_sanity():
    from fastkv_tpu.evals import metrics as M

    assert M.qa_f1_score("eat a sandwich", "eat a sandwich") == 1.0
    assert M.qa_f1_score("the sandwich", "a sandwich!") > 0.5
    assert M.count_score("there are 4 paragraphs", "4") == 1.0
    assert M.retrieval_score("Paragraph 7", "Paragraph 7") == 1.0
    assert M.string_match_all(["the answer is 42."], [["42"]]) == 100.0
    assert M.string_match_all(["nope"], [["42"]]) == 0.0
    assert M.classification_score("Location", "Location", all_classes=["Location", "Person"]) == 1.0
    assert 0.9 < M.rouge_score("the cat sat", "the cat sat") <= 1.0
    assert M.code_sim_score("return x + 1", "return x + 1") == 1.0
