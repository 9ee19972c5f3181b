"""Evaluation dataset registry.

Mirrors the reference's 12-dataset registry and prompt templates
(reference model/utils.py:36-118): every entry produces rows with a
``turns`` list of user messages.  HF ``datasets`` is imported lazily; when
the hub is unreachable (or ``synthetic=True``), a deterministic synthetic
set with the same schema is returned so benchmarks run offline.
"""

from __future__ import annotations

from typing import Callable, Dict, List

MATH_SUFFIX = "\nPlease reason step by step, and put your final answer within \\boxed{}."


def _math_fmt(field: str):
    def fmt(x):
        return [x[field] + MATH_SUFFIX]
    return fmt


def _load_hf(name: str):
    from datasets import load_dataset

    if name == "gsm8k":
        ds = load_dataset("openai/gsm8k", "main", split="test")
        return [{"turns": _math_fmt("question")(x)} for x in ds]
    if name == "math500":
        ds = load_dataset("HuggingFaceH4/MATH-500", split="test")
        return [{"turns": _math_fmt("problem")(x)} for x in ds]
    if name == "aime24":
        ds = load_dataset("HuggingFaceH4/aime_2024", split="train")
        return [{"turns": _math_fmt("problem")(x)} for x in ds]
    if name == "aime25":
        ds = load_dataset("MathArena/aime_2025", split="train")
        return [{"turns": _math_fmt("problem")(x)} for x in ds]
    if name == "alpaca":
        ds = load_dataset("tatsu-lab/alpaca", split="train")
        out = []
        for x in ds:
            text = f"{x['instruction']}\n\nInput:\n{x['input']}" if x["input"] else x["instruction"]
            out.append({"turns": [text]})
        return out
    if name == "mt-bench":
        ds = load_dataset("HuggingFaceH4/mt_bench_prompts", split="train")
        return [{"turns": list(x["prompt"])} for x in ds]
    if name == "humaneval":
        ds = load_dataset("openai/openai_humaneval", split="test")
        fmt = (
            "Write a solution to the following problem and make sure that it passes the tests:\n"
            "```python\n{prompt}\n```"
        )
        return [{"turns": [fmt.format(**x)]} for x in ds]
    if name == "mbpp":
        ds = load_dataset("google-research-datasets/mbpp", "sanitized", split="test")
        return [{"turns": [x["prompt"]]} for x in ds]
    if name == "lbpp":
        url = "https://huggingface.co/datasets/CohereLabs/lbpp/resolve/main/python/test.parquet"
        ds = load_dataset("parquet", data_files={"test": url})["test"]
        return [{"turns": [x["instruction"]]} for x in ds]
    if name == "swe-bench":
        ds = load_dataset("princeton-nlp/SWE-bench_Lite", split="test")
        fmt = "Problem Statement:\n{problem_statement}\nPlease fix the issue described above."
        return [{"turns": [fmt.format(**x)]} for x in ds]
    if name == "livecodebench":
        base = "https://huggingface.co/datasets/livecodebench/code_generation_lite/resolve/main/"
        files = [f"test{i if i > 1 else ''}.jsonl" for i in range(1, 7)]
        ds = load_dataset("json", data_files={"test": [base + f for f in files]})["test"]
        out = []
        for doc in ds:
            system_prompt = (
                "You are an expert Python programmer. You will be given a question (problem specification) "
                "and will generate a correct Python program that matches the specification and passes all tests. "
                "You will NOT return anything except for the program"
            )
            question_block = f"### Question:\n{doc['question_content']}"
            if doc.get("starter_code"):
                format_message = "### Format: Use the following code structure:"
                code_block = f"```python\n{doc['starter_code']}\n```"
            else:
                format_message = "### Format: Write your code in the following format:"
                code_block = "```python\n# YOUR CODE HERE\n```"
            answer_footer = "### Answer: (use the provided format with backticks)"
            out.append({"turns": [f"{system_prompt}\n\n{question_block}\n\n{format_message}\n{code_block}\n\n{answer_footer}"]})
        return out
    raise KeyError(name)


_SYNTH_STEMS = {
    "gsm8k": "Natalia sold {n} clips in April and half as many in May. How many clips did she sell in total?",
    "math500": "Find the sum of all positive integers n such that n^2 + {n} is a perfect square.",
    "aime24": "Let x and y be real numbers with x + y = {n}. Find the maximum of xy.",
    "aime25": "Compute the number of ordered pairs (a, b) of integers with a*b = {n}!.",
    "alpaca": "Give three tips for topic number {n}.",
    "mt-bench": "Compose an engaging travel blog post about trip number {n}.",
    "humaneval": "def f{n}(xs):\n    \"\"\"Return the sorted unique elements of xs.\"\"\"",
    "mbpp": "Write a function to find the shared elements from list pair number {n}.",
    "lbpp": "Implement an efficient algorithm for task {n}.",
    "swe-bench": "Bug report {n}: the parser crashes on empty input.",
    "livecodebench": "Given an array of {n} integers, return the maximum subarray sum.",
}


def _synthetic(name: str, n_rows: int = 32) -> List[dict]:
    stem = _SYNTH_STEMS.get(name, "Question {n}: explain speculative decoding.")
    rows = []
    for i in range(n_rows):
        text = stem.format(n=i + 2)
        if name in ("gsm8k", "math500", "aime24", "aime25"):
            text += MATH_SUFFIX
        rows.append({"turns": [text]})
    return rows


DATASET_REGISTRY: Dict[str, Callable] = {name: _load_hf for name in _SYNTH_STEMS}


def load_and_process_dataset(data_name: str, synthetic: bool = False, n_rows: int = 32) -> List[dict]:
    """Load an eval dataset as a list of {"turns": [...]} rows.

    Falls back to the synthetic offline set when the hub is unreachable.
    """
    if data_name not in DATASET_REGISTRY:
        raise KeyError(f"unknown dataset {data_name!r}; known: {sorted(DATASET_REGISTRY)}")
    if synthetic:
        return _synthetic(data_name, n_rows)
    try:
        return _load_hf(data_name)
    except Exception:
        return _synthetic(data_name, n_rows)
