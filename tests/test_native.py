"""Native C++ IO parser: parity with the pure-Python parsers.

The native library (native/feba_io.cpp via io/native.py ctypes bindings) is
an accelerated drop-in for the hot parse paths; these tests pin its
tokenizer semantics (whitespace runs, '#' comments, blank lines) and its
interning to the Python reference implementation, on cam0 and on synthetic
edge cases.  Skipped entirely when no C++ toolchain is available.
"""

import numpy as np
import pytest

from fish_eye_bundle_adjustment_tpu.io import native, readers
from fish_eye_bundle_adjustment_tpu.io.readers import DatasetError

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native IO library unavailable"
)

MESSY_PHO = (
    "# leading comment\n"
    "\n"
    "T1\tI1\t391.359\t99.507\n"
    "  T2   I1   -408.078 1.296316e3   # trailing comment\n"
    "\t\n"
    "T1 I2 451.273 -1076.714 extra tokens ignored\n"
    "#T9 I9 0 0\n"
    "T3 I2 0 0\r\n"
)


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return p


class TestPhoParity:
    def test_messy_file_matches_python(self, tmp_path):
        p = _write(tmp_path, "a.pho", MESSY_PHO)
        nat = readers._read_pho_native(p)
        py = readers._read_pho_python(p)
        assert nat is not None
        assert nat.uniq_targets == py.uniq_targets == ["T1", "T2", "T3"]
        assert nat.uniq_images == py.uniq_images == ["I1", "I2"]
        np.testing.assert_array_equal(nat.tgt_codes, py.tgt_codes)
        np.testing.assert_array_equal(nat.img_codes, py.img_codes)
        np.testing.assert_array_equal(nat.xy, py.xy)

    def test_cam0_matches_python(self, cam0_dir):
        p = next(cam0_dir.glob("*.pho"))
        nat = readers._read_pho_native(p)
        py = readers._read_pho_python(p)
        assert nat.uniq_targets == py.uniq_targets
        assert nat.uniq_images == py.uniq_images
        np.testing.assert_array_equal(nat.tgt_codes, py.tgt_codes)
        np.testing.assert_array_equal(nat.img_codes, py.img_codes)
        np.testing.assert_array_equal(nat.xy, py.xy)

    def test_short_row_raises(self, tmp_path):
        p = _write(tmp_path, "bad.pho", "T1 I1 1.0\n")
        with pytest.raises(DatasetError, match="4 columns"):
            readers.read_pho(p)

    def test_non_numeric_raises(self, tmp_path):
        p = _write(tmp_path, "bad.pho", "T1 I1 1.0 abc\n")
        with pytest.raises(DatasetError, match="non-numeric"):
            readers.read_pho(p)

    def test_empty_raises(self, tmp_path):
        p = _write(tmp_path, "empty.pho", "# only a comment\n\n")
        with pytest.raises(DatasetError, match="empty"):
            readers.read_pho(p)


class TestIdTable:
    def test_cnt_matches_python(self, tmp_path):
        p = _write(
            tmp_path,
            "a.cnt",
            "# hdr\nT1 1.0 2.0 3.0\nT2 4 5 6  # c\nT3 -1e-3 0 7\n",
        )
        uniq, codes, vals = native.parse_idtable(p, 3)
        assert uniq == ["T1", "T2", "T3"]
        np.testing.assert_array_equal(codes, [0, 1, 2])
        np.testing.assert_allclose(
            vals, [[1, 2, 3], [4, 5, 6], [-1e-3, 0, 7]]
        )

    def test_read_cnt_uses_native(self, tmp_path):
        p = _write(tmp_path, "a.cnt", "T1 1 2 3\nT2 4 5 6\n")
        cnt = readers.read_cnt(p)
        assert cnt.target_ids == ["T1", "T2"]
        np.testing.assert_allclose(cnt.xyz, [[1, 2, 3], [4, 5, 6]])

    def test_missing_column_raises(self, tmp_path):
        p = _write(tmp_path, "a.cnt", "T1 1 2\n")
        with pytest.raises(DatasetError, match="columns"):
            readers.read_cnt(p)


class TestEndToEnd:
    def test_cam0_problem_identical(self, cam0_dir, monkeypatch):
        """load_problem via native vs forced-Python parse: identical arrays."""
        from fish_eye_bundle_adjustment_tpu.io.problem import load_problem

        prob_nat = load_problem(cam0_dir)
        monkeypatch.setattr(readers, "_read_pho_native", lambda p: None)
        monkeypatch.setattr(readers, "_read_idtable_native", lambda p, n: None)
        prob_py = load_problem(cam0_dir)
        np.testing.assert_array_equal(prob_nat.obs_img, prob_py.obs_img)
        np.testing.assert_array_equal(prob_nat.obs_pt, prob_py.obs_pt)
        np.testing.assert_array_equal(prob_nat.obs_cam, prob_py.obs_cam)
        np.testing.assert_array_equal(prob_nat.obs_xy, prob_py.obs_xy)
        assert prob_nat.target_ids == prob_py.target_ids
        assert prob_nat.image_ids == prob_py.image_ids
        np.testing.assert_array_equal(prob_nat.cnt_xyz, prob_py.cnt_xyz)
