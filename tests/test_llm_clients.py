"""LLM adapter tests against an in-process fake HTTP server.

Covers the three reference integrations' robustness patterns without any
egress: Ollama NDJSON streaming + auto-pull + ping
(/root/reference/nlp/_archive/06_cluster_topics_ollama.py:25-116), the
OpenAI/Groq chat protocol with Retry-After-honouring backoff
(06_name_topics_llama.py:35-81), and dry-run + evidence-hash caching +
char budget (06_name_topics_opnai.py:7-117).
"""
from __future__ import annotations

import json
import threading
import unittest
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from review_recommender_tpu.topics.llm_clients import (
    ASPECTS,
    FALLBACK,
    DryRunClient,
    OllamaClient,
    OpenAIChatClient,
    RetryPolicy,
    build_prompt,
    evidence_key,
    from_spec,
    label_topics,
    make_aspect_voter,
    parse_topic_json,
)


class FakeLLMHandler(BaseHTTPRequestHandler):
    """One fake backend speaking BOTH wire protocols."""

    def log_message(self, *a):  # silence
        pass

    def _send(self, code: int, body: bytes, headers=()):
        self.send_response(code)
        for k, v in headers:
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/api/tags":
            self._send(200, b'{"models": []}')
        else:
            self._send(404, b"{}")

    def do_POST(self):
        srv = self.server
        srv.hits.append(self.path)
        n = int(self.headers.get("Content-Length", 0))
        req = json.loads(self.rfile.read(n) or b"{}")
        srv.last_request = req
        srv.last_headers = dict(self.headers)

        if srv.fail_remaining > 0:
            srv.fail_remaining -= 1
            hdrs = (("Retry-After", str(srv.retry_after)),) \
                if srv.retry_after else ()
            self._send(srv.fail_status, b'{"error": "induced"}', hdrs)
            return

        if self.path == "/api/pull":
            lines = [json.dumps({"status": s}) for s in
                     ("pulling manifest", "success")]
            self._send(200, ("\n".join(lines) + "\n").encode())
        elif self.path == "/api/generate":
            # stream the answer as NDJSON chunks, like Ollama does
            answer = json.dumps(srv.answer)
            mid = len(answer) // 2
            lines = [
                json.dumps({"response": answer[:mid]}),
                json.dumps({"response": answer[mid:], "done": True}),
                json.dumps({"response": "IGNORED-AFTER-DONE"}),
            ]
            self._send(200, ("\n".join(lines) + "\n").encode())
        elif self.path == "/v1/chat/completions":
            body = {"choices": [{"message": {
                "content": json.dumps(srv.answer)}}]}
            self._send(200, json.dumps(body).encode())
        else:
            self._send(404, b"{}")


class FakeLLMServer:
    def __init__(self):
        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), FakeLLMHandler)
        self.httpd.hits = []
        self.httpd.fail_remaining = 0
        self.httpd.fail_status = 500
        self.httpd.retry_after = None
        self.httpd.answer = {"topic_label": "battery life",
                             "aspect": "Quality",
                             "rationale": "quotes mention battery"}
        self.httpd.last_request = None
        self.httpd.last_headers = None
        self.thread = threading.Thread(target=self.httpd.serve_forever,
                                       daemon=True)
        self.thread.start()
        self.url = f"http://127.0.0.1:{self.httpd.server_address[1]}"

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()


def fast_retry(**kw) -> RetryPolicy:
    """No real sleeping in tests; waits are recorded for assertions."""
    waits: list = []
    pol = RetryPolicy(sleep=waits.append, **kw)
    pol.waits = waits
    return pol


class TestOllamaClient(unittest.TestCase):
    @classmethod
    def setUpClass(cls):
        cls.srv = FakeLLMServer()

    @classmethod
    def tearDownClass(cls):
        cls.srv.close()

    def setUp(self):
        self.srv.httpd.fail_remaining = 0
        self.srv.httpd.fail_status = 500
        self.srv.httpd.retry_after = None
        self.srv.httpd.hits.clear()

    def test_ping_and_pull(self):
        c = OllamaClient(host=self.srv.url, model="m1", retry=fast_retry())
        self.assertTrue(c.ping())
        c.ensure_model()  # must not raise; streams /api/pull
        self.assertIn("/api/pull", self.srv.httpd.hits)
        bad = OllamaClient(host="http://127.0.0.1:1", timeout=0.5)
        self.assertFalse(bad.ping())

    def test_streamed_generate_reassembles_json(self):
        c = OllamaClient(host=self.srv.url, model="m1", retry=fast_retry())
        raw = c.complete(build_prompt(["battery died fast"]))
        meta = parse_topic_json(raw)
        self.assertEqual(meta["topic_label"], "battery life")
        self.assertEqual(meta["aspect"], "Quality")
        # stop at done: the post-done chunk must not leak into the reply
        self.assertNotIn("IGNORED", raw)
        # strict-JSON request shape
        req = self.srv.httpd.last_request
        self.assertEqual(req["format"], "json")
        self.assertEqual(req["options"]["temperature"], 0.0)

    def test_backoff_then_success(self):
        self.srv.httpd.fail_remaining = 2
        pol = fast_retry()
        c = OllamaClient(host=self.srv.url, model="m1", retry=pol)
        meta = parse_topic_json(c.complete("p"))
        self.assertEqual(meta["aspect"], "Quality")
        self.assertEqual(len(pol.waits), 2)
        # exponential: second wait > first
        self.assertGreater(pol.waits[1], pol.waits[0])

    def test_retry_exhaustion_returns_fallback(self):
        self.srv.httpd.fail_remaining = 99
        c = OllamaClient(host=self.srv.url, model="m1",
                         retry=fast_retry(max_retries=3))
        self.assertEqual(json.loads(c.complete("p")), FALLBACK)

    def test_non_retryable_status_raises(self):
        self.srv.httpd.fail_remaining = 1
        self.srv.httpd.fail_status = 400
        c = OllamaClient(host=self.srv.url, model="m1", retry=fast_retry())
        with self.assertRaises(Exception):
            c._call("p", None)


class TestOpenAIChatClient(unittest.TestCase):
    @classmethod
    def setUpClass(cls):
        cls.srv = FakeLLMServer()

    @classmethod
    def tearDownClass(cls):
        cls.srv.close()

    def setUp(self):
        self.srv.httpd.fail_remaining = 0
        self.srv.httpd.fail_status = 500
        self.srv.httpd.retry_after = None
        self.srv.httpd.hits.clear()

    def test_chat_protocol(self):
        c = OpenAIChatClient(base_url=self.srv.url, model="gpt-x",
                             api_key="sk-test", retry=fast_retry())
        raw = c.complete("label this", system="sys")
        self.assertEqual(parse_topic_json(raw)["topic_label"],
                         "battery life")
        req = self.srv.httpd.last_request
        self.assertEqual(req["model"], "gpt-x")
        self.assertEqual(req["messages"][0],
                         {"role": "system", "content": "sys"})
        self.assertEqual(req["response_format"], {"type": "json_object"})
        self.assertEqual(self.srv.httpd.last_headers["Authorization"],
                         "Bearer sk-test")

    def test_429_honours_retry_after(self):
        self.srv.httpd.fail_remaining = 1
        self.srv.httpd.fail_status = 429
        self.srv.httpd.retry_after = 7
        pol = fast_retry()
        c = OpenAIChatClient(base_url=self.srv.url, api_key="k", retry=pol)
        c.complete("p")
        self.assertEqual(len(pol.waits), 1)
        self.assertGreaterEqual(pol.waits[0], 7.0)

    def test_dry_run_auto_only_for_official_endpoint(self):
        # keyless + the OFFICIAL endpoint -> dry (the reference script's
        # default); keyless + an explicit custom URL -> a real request (a
        # local vLLM/llama.cpp server needs no key — silent dry-run there
        # wrote garbage labels with rc=0, self-review r4)
        official = OpenAIChatClient(api_key=None)
        self.assertTrue(official.dry_run)
        raw = official.complete("p")
        self.assertEqual(parse_topic_json(raw)["rationale"], "dry_run")

        c = OpenAIChatClient(base_url=self.srv.url, api_key=None)
        self.assertFalse(c.dry_run)
        c.complete("p")
        self.assertEqual(len(self.srv.httpd.hits), 1)

    def test_forced_dry_run_makes_no_network_calls(self):
        c = OpenAIChatClient(base_url=self.srv.url, api_key=None,
                             dry_run=True)
        raw = c.complete("p")
        self.assertEqual(self.srv.httpd.hits, [])
        self.assertEqual(parse_topic_json(raw)["rationale"], "dry_run")

    def test_no_sleep_after_final_failed_attempt(self):
        from review_recommender_tpu.topics.llm_clients import (
            LLMHTTPError,
            RetryPolicy,
        )

        sleeps = []

        class Always429(OpenAIChatClient):
            def _call(self, prompt, system):
                raise LLMHTTPError(429)

        c = Always429(api_key="k", retry=RetryPolicy(
            max_retries=3, sleep=sleeps.append))
        raw = c.complete("p")
        self.assertEqual(parse_topic_json(raw)["rationale"],
                         "retry_exhausted")
        # attempts 0 and 1 back off; the FINAL attempt must not sleep
        self.assertEqual(len(sleeps), 2)


class TestParsing(unittest.TestCase):
    def test_label_regex_fallback(self):
        meta = parse_topic_json("LABEL: Loose Threads; REASONS: meh")
        self.assertEqual(meta["topic_label"], "Loose Threads")
        self.assertEqual(meta["aspect"], "Misc")

    def test_garbage_falls_back_to_misc(self):
        self.assertEqual(parse_topic_json("{not json")["topic_label"],
                         "Misc")
        self.assertEqual(parse_topic_json("")["topic_label"], "Misc")

    def test_aspect_case_salvage_and_taxonomy_guard(self):
        meta = parse_topic_json(json.dumps(
            {"topic_label": "x", "aspect": "quality"}))
        self.assertEqual(meta["aspect"], "Quality")
        meta = parse_topic_json(json.dumps(
            {"topic_label": "x", "aspect": "Nonsense"}))
        self.assertEqual(meta["aspect"], "Misc")
        self.assertTrue(set(ASPECTS), msg="taxonomy present")

    def test_rationale_truncated(self):
        meta = parse_topic_json(json.dumps(
            {"topic_label": "x", "aspect": "Misc", "rationale": "r" * 999}))
        self.assertEqual(len(meta["rationale"]), 200)

    def test_build_prompt_truncates_quotes(self):
        p = build_prompt(["  a   b " * 200, "q2"], max_examples=1)
        self.assertNotIn("q2", p)
        self.assertIn('- "a b', p)


class TestLabelTopics(unittest.TestCase):
    @classmethod
    def setUpClass(cls):
        cls.srv = FakeLLMServer()

    @classmethod
    def tearDownClass(cls):
        cls.srv.close()

    def setUp(self):
        self.srv.httpd.fail_remaining = 0
        self.srv.httpd.hits.clear()

    def test_cache_resume_is_evidence_keyed(self):
        import tempfile
        with tempfile.TemporaryDirectory() as d:
            cache = f"{d}/cache.json"
            quotes = {0: ["battery died"], 1: ["socks ripped"]}
            c = OpenAIChatClient(base_url=self.srv.url, api_key="k",
                                 retry=fast_retry())
            out1 = label_topics(c, quotes, cache_path=cache)
            self.assertEqual(len(self.srv.httpd.hits), 2)
            # resume: same evidence under RENUMBERED ids -> zero new calls
            c2 = OpenAIChatClient(base_url=self.srv.url, api_key="k",
                                  retry=fast_retry())
            out2 = label_topics(
                c2, {7: ["battery died"], 9: ["socks ripped"]},
                cache_path=cache)
            self.assertEqual(len(self.srv.httpd.hits), 2)
            self.assertEqual(out1[0], out2[7])
            self.assertNotEqual(evidence_key(["a"]), evidence_key(["b"]))

    def test_char_budget_guard(self):
        c = OpenAIChatClient(base_url=self.srv.url, api_key="k",
                             retry=fast_retry())
        out = label_topics(c, {0: ["q" * 50], 1: ["r" * 50]},
                           char_budget=1)  # nothing fits
        self.assertEqual(self.srv.httpd.hits, [])
        self.assertEqual(out[0]["rationale"], "char_budget")

    def test_transient_fallbacks_do_not_poison_the_cache(self):
        """Self-review r4: a cached retry_exhausted/char_budget entry would
        pin the topic at Misc forever, even after the backend recovers —
        only real answers may persist."""
        import tempfile
        with tempfile.TemporaryDirectory() as d:
            cache = f"{d}/cache.json"
            quotes = {0: ["battery died"]}
            # run 1: backend down for every attempt -> fallback answer
            self.srv.httpd.fail_remaining = 99
            c = OpenAIChatClient(base_url=self.srv.url, api_key="k",
                                 retry=fast_retry())
            out1 = label_topics(c, quotes, cache_path=cache)
            self.assertEqual(out1[0]["rationale"], "retry_exhausted")
            # run 2: backend healthy -> the topic is re-labeled for real
            self.srv.httpd.fail_remaining = 0
            c2 = OpenAIChatClient(base_url=self.srv.url, api_key="k",
                                  retry=fast_retry())
            out2 = label_topics(c2, quotes, cache_path=cache)
            self.assertNotEqual(out2[0]["rationale"], "retry_exhausted")
            # run 3: and the REAL answer is cached
            hits_before = len(self.srv.httpd.hits)
            c3 = OpenAIChatClient(base_url=self.srv.url, api_key="k",
                                  retry=fast_retry())
            label_topics(c3, quotes, cache_path=cache)
            self.assertEqual(len(self.srv.httpd.hits), hits_before)

    def test_aspect_voter_plugs_into_classify(self):
        from review_recommender_tpu.topics.naming import (
            classify_aspects_llm,
        )
        c = OpenAIChatClient(base_url=self.srv.url, api_key="k",
                             retry=fast_retry())
        voter = make_aspect_voter(c)
        out = classify_aspects_llm(
            {0: {"label": "battery", "quotes": ["died fast"]}},
            voter, votes=3)
        self.assertEqual(out[0], "quality")


class TestFromSpec(unittest.TestCase):
    def test_specs(self):
        self.assertIsInstance(from_spec("dry"), DryRunClient)
        c = from_spec("ollama:http://h:1", model="m")
        self.assertIsInstance(c, OllamaClient)
        self.assertEqual((c.host, c.model), ("http://h:1", "m"))
        o = from_spec("openai:http://h:2", model="g")
        self.assertIsInstance(o, OpenAIChatClient)
        self.assertEqual((o.base_url, o.model), ("http://h:2", "g"))
        with self.assertRaises(ValueError):
            from_spec("wat:x")

    def test_dry_client_labels_from_evidence(self):
        c = DryRunClient()
        raw = c.complete(build_prompt(["battery died fast again"]))
        self.assertEqual(parse_topic_json(raw)["topic_label"],
                         "battery died fast")


if __name__ == "__main__":
    unittest.main()
