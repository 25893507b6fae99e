"""CLI flag parity and post-processing statistics semantics."""

import numpy as np
import pytest

from poserisk_release_tpu.cli import build_parser
from poserisk_release_tpu.outputs.stats import format_result_txt, post_process_scores

pytestmark = pytest.mark.smoke  # fast tier: no big model compiles


class TestCLI:
    def test_reference_flags_and_defaults(self):
        args = build_parser().parse_args([])
        # Defaults mirror /root/reference/main/run.py:10-20
        assert args.gpu == "0"
        assert args.type == "REBA,RULA"
        assert args.input == "example/input.mp4"
        assert args.info == "example/additional_information.json"
        assert args.output == "output"
        assert args.visualize is True
        assert args.debug is False
        assert args.debug_joints == ""
        assert args.debug_frame == -1

    def test_new_flags(self):
        args = build_parser().parse_args(
            ["--multi_person", "--gender", "female", "--cpu", "--profile"]
        )
        assert args.multi_person and args.cpu and args.profile
        assert args.gender == "female"

    def test_invalid_gender_rejected(self):
        with pytest.raises(SystemExit):
            build_parser().parse_args(["--gender", "robot"])


class TestStats:
    def _results(self, scores):
        return [{"score": int(s), "log_score": [1, 1, 1]} for s in scores]

    def test_stats_reference_semantics(self, tmp_path):
        scores = [3, 5, 5, 2, 9, 5, 1, 7, 7, 4]
        frames = np.arange(len(scores))
        final, scores_log, logs = post_process_scores(
            self._results(scores), (0, frames, len(scores)), str(tmp_path),
            title="REBA", make_plot=False,
        )
        desc = np.sort(scores)[::-1]
        assert final[0] == round(float(np.mean(scores)), 3)
        assert final[1] == round(float(desc[: len(scores) // 2].mean()), 3)
        assert final[2] == round(float(desc[:1].mean()), 3)  # len//10 == 1
        assert final[3] == 9
        assert final[4] == 5  # mode
        # scores_log preserves frame order for CSV/video
        assert scores_log.tolist() == scores

    def test_mode_tie_takes_smallest(self, tmp_path):
        scores = [2, 2, 8, 8, 5]
        final, _, _ = post_process_scores(
            self._results(scores), (0, np.arange(5), 5), str(tmp_path),
            title="RULA", make_plot=False,
        )
        assert final[4] == 2  # scipy mode: smallest modal value on ties

    def test_plot_written(self, tmp_path):
        import os.path as osp

        post_process_scores(
            self._results([1, 2, 3, 4]), (0, np.arange(4), 4), str(tmp_path),
            title="REBA", make_plot=True,
        )
        assert osp.isfile(osp.join(str(tmp_path), "REBA_score.png"))

    def test_max_score_keeps_int_dtype(self, tmp_path):
        """base.py:269 rounds the max WITHOUT a float cast, and REBA/RULA
        frame scores are integers -- so the reference txt prints
        'MAX Score: 12', never '12.0'. Caught live by the executed-oracle
        e2e diff (test_reference_differential_predictor.py); the json
        summary stays serializable (np scalar -> native in finite_or_none)."""
        import json

        from poserisk_release_tpu.outputs.stats import (
            final_scores_stats,
            scores_summary_block,
        )

        final = final_scores_stats([2, 3, 4, 4])
        assert f"{final[3]}" == "4"
        body = format_result_txt(final, 1, "ok", trailing_space=False)
        assert "\nMAX Score: 4 \n" in body
        block = scores_summary_block({"REBA": (final, 1, "ok")})
        assert json.loads(json.dumps(block))["REBA"]["max"] == 4

    def test_result_txt_whitespace_parity(self):
        body = format_result_txt((1.0, 2.0, 3.0, 4.0, 5), 2, "Low risk.", trailing_space=True)
        # 1 space after the %10 value + the f-string continuation's 20 spaces
        assert "%10 Score: 3.0                     \nMAX Score: 4.0 " in body
        assert body.endswith("Low risk. ")
        body2 = format_result_txt((1, 2, 3, 4, 5), 1, "ok", trailing_space=False)
        assert body2.endswith("ok")


class TestScoresSummaryBlock:
    def test_shared_schema_and_nan_policy(self):
        """ONE builder feeds run_summary.json and stream_summary.json; NaN
        (the reference's top-10% mean of a <10-frame clip) becomes null in
        the machine-readable surface."""
        from poserisk_release_tpu.outputs.stats import (
            finite_or_none,
            scores_summary_block,
        )

        summary = {"REBA": ((4.1, 5.0, float("nan"), 7.0, 4.0), 3, "High")}
        block = scores_summary_block(summary)
        assert block == {"REBA": {
            "avg": 4.1, "p50": 5.0, "p10": None, "max": 7.0, "mode": 4.0,
            "action_level": 3, "action": "High",
        }}
        assert finite_or_none(float("inf")) is None
        assert finite_or_none("n/a") == "n/a"
