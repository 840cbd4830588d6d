"""Parser of scripts/r4b_translate.py (the trimmed N=128 queue log ->
campaign-format translator feeding binder_assemble / binder_fss_final)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.r4b_translate import parse  # noqa: E402

LOG = """\
#### [r4b-1] from-below arm: V14 T0.7 -> T0.9, 4000 iters ####
# elapsed time: 1471.9(sec)  saved: runs/RBMTrSymmLICH-L128NF4A2.5T0.9V14
=== stag theta=0.9 V14 ===
# stag m1=0.120642 m2=0.022761 m4=0.001517 binder=0.024008 binder_err=0.002217
#### [r4b-3] from-above arm ####
=== stag theta=0.9 V15 ===
# stag m1=0.5 m2=0.3 m4=0.12 binder=0.555555 binder_err=0.010000
=== corrratio theta=0.9 V14 ===
# corrratio R=0.123456 R_err=0.002000
=== corrratio theta=0.9 V15 ===
# corrratio R=0.654321 R_err=0.003000
#### [r4b-5] stretch re-measure ####
=== stag theta=0.9 V14 ===
# stag m1=0.13 m2=0.024 m4=0.0016 binder=0.026100 binder_err=0.002300
"""


def test_parse_groups_by_lineage_and_keeps_reading_order(tmp_path):
    src = tmp_path / "q.log"
    src.write_text(LOG)
    stag, corr = parse(str(src))
    # V14 measured twice (initial + post-stretch), in log order.
    assert stag[(0.9, 14)] == [0.024008, 0.026100]
    assert stag[(0.9, 15)] == [0.555555]
    assert corr[(0.9, 14)] == (0.123456, 0.002)
    assert corr[(0.9, 15)] == (0.654321, 0.003)


def test_parse_ignores_noise_between_header_and_reading(tmp_path):
    # Warnings/banners between the === header and the # stag line must not
    # desynchronise the pending-header state machine.
    noisy = LOG.replace(
        "=== stag theta=0.9 V15 ===\n",
        "=== stag theta=0.9 V15 ===\nWARNING: platform 'axon' is experimental\n",
    )
    src = tmp_path / "q.log"
    src.write_text(noisy)
    stag, _ = parse(str(src))
    assert stag[(0.9, 15)] == [0.555555]
