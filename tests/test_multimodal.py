

def test_audio_window_energy_invariants(spark, sf_dir):
    import numpy as np

    from market_pulse_data_pipeline_spark.functions.multimodal import (
        audio_window_energy,
        documents_to_media,
    )
    from market_pulse_data_pipeline_spark.sources.tables import load_table

    media = documents_to_media(load_table(spark, sf_dir, "documents"))
    wins = audio_window_energy(media, win=40, hop=16)
    rows = wins.collect()
    audio_ids = {
        r.media_id
        for r in media.filter("media_type = 'audio'").select("media_id").collect()
    }
    assert {r.media_id for r in rows} == audio_ids  # pruned to audio only
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    sizes = {
        r.media_id: r.byte_size
        for r in media.filter("media_type = 'audio'").collect()
    }
    for mid, rs in by_id.items():
        n = sizes[mid]
        expect = max(0, (n - 40) // 16) + (1 if n >= 40 else 0) or 1
        assert len(rs) == expect, mid
        assert sorted(r.win_id for r in rs) == list(range(len(rs)))
        for r in rs:
            assert 0 <= r.rms <= 128.0
            assert 0 <= r.n_zero_cross < r.n_samples
    # deterministic: second run bit-equal
    again = {(r.media_id, r.win_id): r.rms for r in wins.collect()}
    assert again == {(r.media_id, r.win_id): r.rms for r in rows}


def test_audio_window_stats_matches_numpy_replay(spark):
    """Pin audio_window_stats (the hash-checked media_audio_windows
    path) against a pure-numpy replay, including the short-clip
    truncation edge (n < win -> exactly one window of n samples)."""
    import numpy as np

    from market_pulse_data_pipeline_spark.functions.multimodal import (
        audio_window_stats,
    )

    clips = [
        (1, b"a" * 5),            # constant short clip: zero crossings
        (4, bytes(range(97))),    # short ramp (n < win)
        (7, bytes([10, 200] * 300)),  # 600 samples: 2 full windows
        (10, b""),                # empty payload: dropped
        (13, None),               # null payload: dropped
    ]
    media = spark.createDataFrame(
        [(mid, "audio", payload) for mid, payload in clips],
        "media_id long, media_type string, content binary",
    )
    got = {
        (r.media_id, r.win_id): (
            r.n_samples, r.sum_amp, r.ssq_amp, r.n_mean_cross
        )
        for r in audio_window_stats(media, win=400, hop=160).collect()
    }

    expect = {}
    for mid, payload in clips:
        x = np.frombuffer(payload or b"", dtype=np.uint8).astype(np.int64)
        n = len(x)
        if n == 0:
            continue
        total = int(x.sum())
        neg = x * n < total
        n_win = (n - 400) // 160 + 1 if n >= 400 else 1
        for w in range(n_win):
            seg, sn = x[w * 160 : w * 160 + 400], neg[w * 160 : w * 160 + 400]
            expect[(mid, w)] = (
                len(seg),
                int(seg.sum()),
                int((seg * seg).sum()),
                int((sn[1:] != sn[:-1]).sum()),
            )
    assert got == expect
    # truncation edge explicit: 97-sample clip got ONE window of 97
    assert got[(4, 0)][0] == 97
    # constant clip: x*n == S everywhere -> no sample is "below mean"
    assert got[(1, 0)][3] == 0
