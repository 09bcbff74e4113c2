"""Field lablers for the generate path — parity with
/root/reference/internal/generate/labler.go.

Three labler types (labler.go:16-54): `basic` (positional field-N
names), `local-ml` (KNN over the 34-dim features, ops.mlfeatures), and
`remote-llm`. The remote labler builds the REFERENCE'S exact prompt
(labler.go:104-123: label set, per-field example lists capped at 10
examples × 200 chars, strict-JSON answer contract) and parses the
answer with the same "other" fallback per unmapped field. The transport
is a pluggable ``complete(prompt) -> str`` callable — an HTTP JSON
endpoint, an SDK call, or a test stub plug in identically (the
reference hardcodes the googleai SDK; any completion API satisfies the
same contract)."""

from __future__ import annotations

import json

LABLER_TYPE_BASIC = "basic"
LABLER_TYPE_LOCAL_ML = "local-ml"
LABLER_TYPE_REMOTE_LLM = "remote-llm"

PROMPT_TEMPLATE = """Given the following examples of field values extracted from a webpage, provide a label for each field.
The labels should always be one of the following: %s.
If a field's values do not match any of the labels, label it as "other".

Here are the field examples:

%s

Provide your answer as a plain JSON string where the keys are "field-0", "field-1", etc., and the values are the predicted labels.
Just return the JSON and nothing else. Don't wrap the JSON in any quotes or code blocks. JUST DON'T!"""


def _examples_strings(examples, max_nr=10, max_len=200):
    """getExamplesStrings (labler.go:186-200)."""
    out = []
    for i, ex in enumerate(examples):
        if i >= max_nr:
            break
        s = str(ex)
        out.append(s[:max_len] if len(s) > max_len else s)
    return out


def build_label_prompt(candidates, label_set, max_nr=10, max_len=200):
    """The reference's prompt, byte-for-byte (labler.go:104-123).
    candidates: discover_fields output (dicts with 'examples')."""
    examples_strs = []
    for i, c in enumerate(candidates):
        exs = _examples_strings(c["examples"], max_nr, max_len)
        examples_strs.append(f'field-{i}: ["' + '", "'.join(exs) + '"]')
    return PROMPT_TEMPLATE % (", ".join(label_set),
                              "\n".join(examples_strs))


def parse_label_answer(answer, n_fields):
    """JSON {'field-i': label} → list of n_fields names; unmapped or
    unparseable fields fall back to 'other' (labler.go:131-146)."""
    try:
        mapping = json.loads(answer)
    except (TypeError, ValueError) as e:
        raise ValueError(f"error parsing LLM response: {e}")
    if not isinstance(mapping, dict):
        raise ValueError("error parsing LLM response: not a JSON object")
    return [str(mapping.get(f"field-{i}", "other"))
            for i in range(n_fields)]


class RemoteLLMLabler:
    """remote-llm labler: __call__ matches infer_scraper's
    ``labeler(examples, index) -> name`` hook. The completion runs ONCE
    over all candidates (the prompt carries every field); pass the
    candidates up front or let the first call trigger a lazy batch.

    transport: callable(prompt:str) -> str. ``http_transport`` builds
    one for a JSON completion endpoint."""

    def __init__(self, transport, label_set, candidates=None):
        self.transport = transport
        self.label_set = list(label_set)
        self._names = None
        if candidates is not None:
            self.label_candidates(candidates)

    def label_candidates(self, candidates):
        prompt = build_label_prompt(candidates, self.label_set)
        answer = self.transport(prompt)
        self._names = parse_label_answer(answer, len(candidates))
        return self._names

    def __call__(self, examples, index):
        if self._names is None:
            raise RuntimeError(
                "call label_candidates(candidates) first (the prompt "
                "covers all fields in one completion)")
        return self._names[index] if index < len(self._names) else "other"


def http_transport(endpoint, model="", api_key="", session=None,
                   timeout=60):
    """Generic JSON completion transport: POST {model, prompt} with
    bearer auth, expect {'text': ...} (or a raw-string body) back."""

    def complete(prompt):
        import requests

        http = session or requests
        headers = {"Content-Type": "application/json"}
        if api_key:
            headers["Authorization"] = f"Bearer {api_key}"
        resp = http.post(endpoint, json={"model": model, "prompt": prompt},
                         headers=headers, timeout=timeout)
        if resp.status_code != 200:
            raise RuntimeError(
                f"LLM endpoint error: {resp.status_code} {resp.text}")
        try:
            body = resp.json()
            return body["text"] if isinstance(body, dict) and "text" in body \
                else resp.text
        except ValueError:
            return resp.text

    return complete


def new_labler(config, knn_model=None, transport=None):
    """Labler factory (labler.go:42-54) → a ``labeler(examples, i)``
    hook for ops.autoconfig.infer_scraper.
    config: dict with 'type' + type-specific keys."""
    ltype = config.get("type", LABLER_TYPE_BASIC)
    if ltype == LABLER_TYPE_BASIC:
        return lambda examples, i: f"field-{i}"
    if ltype == LABLER_TYPE_LOCAL_ML:
        if knn_model is None:
            raise ValueError("local-ml labler needs a trained KNN model")
        from .mlfeatures import features_row
        from .wordlist import default_words, load_words

        words = (load_words(config["words_dir"])
                 if config.get("words_dir") else default_words())

        def knn_label(examples, i):
            import numpy as np

            X = [features_row(str(e), words) for e in examples[:10]]
            preds = knn_model.predict(np.asarray(X, dtype=float))
            vals, counts = np.unique(preds, return_counts=True)
            return str(vals[counts.argmax()])

        return knn_label
    if ltype == LABLER_TYPE_REMOTE_LLM:
        t = transport or http_transport(config["endpoint"],
                                        config.get("llm_model", ""),
                                        config.get("api_key", ""))
        return RemoteLLMLabler(t, config.get("label_set", []))
    raise ValueError(f"labler of type {ltype} not implemented")
