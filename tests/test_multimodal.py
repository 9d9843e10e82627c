

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
