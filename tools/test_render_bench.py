#!/usr/bin/env python3
"""Unit tests for render_bench.load_bench — the three record shapes the
driver and graft.Bench can produce, including the tail formats that broke
the old single-regex extractor.

Run: python3 -m unittest tools.test_render_bench  (or cd tools && python3 -m unittest)
"""
import json
import unittest

try:
    from tools.render_bench import load_bench
except ImportError:  # run from inside tools/
    from render_bench import load_bench

BENCH = {"metric": "total", "value": 1.5, "unit": "sec",
         "queries": {"p01": 1.0, "p02": 0.5}, "errors": {}, "sf": "/x/sf0.01"}


class LoadBenchTest(unittest.TestCase):
    def test_bare_bench_line(self):
        self.assertEqual(load_bench(json.dumps(BENCH)), BENCH)

    def test_bare_line_with_log_prefix(self):
        # sbt prefixes; load_bench must skip to the first '{'
        self.assertEqual(load_bench("[info] running\n" + json.dumps(BENCH)), BENCH)

    def test_driver_wrapper_parsed_field(self):
        wrapper = {"n": 1, "rc": 0, "parsed": BENCH, "tail": ""}
        self.assertEqual(load_bench(json.dumps(wrapper)), BENCH)

    def test_driver_wrapper_tail_only(self):
        tail = "WARN noise\n" + json.dumps(BENCH) + "\nexit 0"
        wrapper = {"n": 1, "rc": 0, "parsed": None, "tail": tail}
        self.assertEqual(load_bench(json.dumps(wrapper)), BENCH)

    def test_tail_with_space_formatted_queries(self):
        # interior '} ' inside the record: the old non-greedy regex cut the
        # match at the first '}' followed by whitespace -> unbalanced JSON
        rec = json.loads(json.dumps(BENCH))
        tail = ('{"metric": "total", "value": 1.5, "unit": "sec", '
                '"queries": {"p01": 1.0, "p02": 0.5} , "errors": {}, '
                '"sf": "/x/sf0.01"}')
        wrapper = {"n": 1, "rc": 0, "tail": tail}
        self.assertEqual(load_bench(json.dumps(wrapper)), rec)

    def test_tail_with_brace_space_in_string_value(self):
        rec = dict(BENCH, errors={"p03": "bad plan } here"})
        wrapper = {"n": 1, "rc": 0, "tail": json.dumps(rec)}
        self.assertEqual(load_bench(json.dumps(wrapper)), rec)

    def test_tail_with_metric_mention_in_log_line(self):
        # a log line mentioning {"metric" without valid JSON must be skipped
        tail = 'echo {"metric" not json\n' + json.dumps(BENCH)
        wrapper = {"tail": tail}
        self.assertEqual(load_bench(json.dumps(wrapper)), BENCH)

    def test_no_bench_line_raises(self):
        with self.assertRaises(SystemExit):
            load_bench(json.dumps({"n": 1, "rc": 1, "tail": "all noise"}))


if __name__ == "__main__":
    unittest.main()
