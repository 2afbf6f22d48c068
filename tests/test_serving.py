"""Multi-session streaming server tests (tiny preset, CPU mesh).

The server's per-session record semantics must equal the single-session
StreamingOverlap3Pipeline's (same engine, same math); the cross-session
batching, backpressure and lifecycle are server-specific.
"""
import types

import numpy as np
import pytest

from audio_classification_tpu.audio_io import write_wav
from audio_classification_tpu.pipelines.serving import StreamingServer
from audio_classification_tpu.pipelines.streaming import StreamingOverlap3Pipeline

SR = 16000


def _tone(dur, hz, amp=0.3):
    t = np.arange(int(dur * SR)) / SR
    return (amp * np.sin(2 * np.pi * hz * t)).astype(np.float32)


def _args(**kw):
    base = dict(
        sample_rate=SR, process_seconds=2.0, osd_thr=0.5, osd_win=0.5,
        osd_hop=0.1, sep_backend="convtasnet", sep_checkpoint="",
        sv_threshold=-1.0, min_overlap_dur=0.4, language="auto",
        preset="tiny", checkpoint_dir="", seed=0, max_batch=4,
        max_segment_sec=8.0, tokens="",
    )
    base.update(kw)
    return types.SimpleNamespace(**base)


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    d = tmp_path_factory.mktemp("serving")
    t1, t2 = d / "t1.wav", d / "t2.wav"
    write_wav(t1, _tone(1.0, 440), SR)
    write_wav(t2, _tone(1.0, 700), SR)
    mix1 = _tone(2.0, 440) + np.concatenate([np.zeros(SR, np.float32), _tone(1.0, 880)])
    mix2 = _tone(2.0, 700) + 0.2 * _tone(2.0, 250)
    return dict(dir=d, targets=[str(t1), str(t2)], mixes=[mix1, mix2])


@pytest.fixture(scope="module")
def server(fixtures):
    srv = StreamingServer(_args(), autostart=False)
    yield srv
    srv.close()


def _sig(rec):
    return (rec["kind"], rec["stream"], rec["text"], round(rec["sv_score"], 3))


def test_multi_session_matches_solo(server, fixtures):
    """Each session's records equal a solo single-session pipeline run on
    the same engine (cross-session batching must not change the math)."""
    sids = [server.open_session(target_wav=t) for t in fixtures["targets"]]
    for sid, mix in zip(sids, fixtures["mixes"]):
        server.add_audio(sid, mix)
    n = server.step()
    assert n == 2  # both sessions' chunks in ONE batched tick
    got = {sid: sorted(_sig(r) for r in server.get_results(sid)) for sid in sids}

    for sid, mix, target in zip(sids, fixtures["mixes"], fixtures["targets"]):
        solo = StreamingOverlap3Pipeline(_args(), target, engine=server.engine)
        try:
            solo.add_audio_data(mix)
            solo.drain(timeout=120)
            import time
            t0 = time.time()
            recs = []
            while time.time() - t0 < 60 and not recs:
                recs = solo.get_results()
                time.sleep(0.05)
        finally:
            solo.close()
        assert got[sid] == sorted(_sig(r) for r in recs)

    for sid in sids:
        server.close_session(sid)


def test_record_fields_and_stats(server, fixtures):
    sid = server.open_session(target_wav=fixtures["targets"][0])
    server.add_audio(sid, fixtures["mixes"][0])
    server.step()
    recs = server.get_results(sid)
    assert recs
    required = {"start", "end", "kind", "stream", "text", "asr_time",
                "sv_score", "target_src_text"}
    kinds = set()
    for r in recs:
        assert required == set(r.keys())
        kinds.add(r["kind"])
    assert "full_separation" in kinds  # unconditional whole-chunk row
    st = server.stats()
    assert st["ticks"] >= 2 and st["chunks_per_tick_max"] >= 2
    server.close_session(sid)


def test_windowing_and_flush(server, fixtures):
    """Sub-window chunks buffer until process_seconds accumulate; flush
    forces a partial window out."""
    sid = server.open_session(target_wav=fixtures["targets"][0])
    half = _tone(0.8, 440)
    server.add_audio(sid, half)
    assert server.step() == 0          # below the 2 s window: nothing pending
    server.add_audio(sid, half)
    assert server.step() == 0
    server.add_audio(sid, half)        # 2.4 s buffered -> one pending chunk
    assert server.step() == 1
    server.add_audio(sid, half)
    server.flush(sid)                  # partial window forced out
    assert server.step() == 1
    server.close_session(sid)


def test_backpressure_drops_oldest(server, fixtures):
    sid = server.open_session(target_wav=fixtures["targets"][0])
    win = _tone(2.0, 440)
    for _ in range(StreamingServer.MAX_PENDING + 3):
        server.add_audio(sid, win)
    with server._lock:
        assert len(server._sessions[sid].pending) == StreamingServer.MAX_PENDING
    while server.step():
        pass
    server.close_session(sid)


def test_mixed_rate_sessions(server, fixtures):
    """8 kHz callers resample inside the tick (one bucketed batch per
    source rate); records must equal feeding the pre-resampled 16 kHz
    audio directly."""
    eng = server.engine
    t8 = np.arange(int(2.0 * 8000)) / 8000
    mix8 = (0.3 * np.sin(2 * np.pi * 440 * t8)
            + 0.3 * np.sin(2 * np.pi * 880 * t8)).astype(np.float32)
    mix16 = eng.resample(mix8, 8000, SR)
    sid8 = server.open_session(target_wav=fixtures["targets"][0])
    sid16 = server.open_session(target_wav=fixtures["targets"][0])
    server.add_audio(sid8, mix8, sample_rate=8000)
    server.add_audio(sid16, mix16)
    assert server.step() == 2          # both rates in ONE batched tick
    got8 = sorted(_sig(r) for r in server.get_results(sid8))
    got16 = sorted(_sig(r) for r in server.get_results(sid16))
    assert got8 and got8 == got16
    server.close_session(sid8)
    server.close_session(sid16)


def test_session_lifecycle(server, fixtures):
    sid = server.open_session(target_wav=fixtures["targets"][0])
    server.close_session(sid)
    with pytest.raises(KeyError):
        server.add_audio(sid, _tone(2.0, 440))
    with pytest.raises(ValueError):
        server.open_session()
    # enrollment via a precomputed vector skips the embed/transcribe calls
    v = np.zeros(32, np.float32)
    sid2 = server.open_session(target_vec=v)
    assert server.get_results(sid2) == []
    server.close_session(sid2)


@pytest.mark.slow
def test_mesh_server_matches_single(server, fixtures):
    """The serving surface runs on the mesh: a --data-parallel 4
    --model-parallel 2 server (same seed, so same weights) must emit the
    same per-session records as the single-device server — every tick's
    cross-session batch shards over "data", the separators TP-shard over
    "model", and sv_threshold=-1 forces the non-best-branch extras path
    (device-resident branch pulls) through the mesh fallback too."""
    msrv = StreamingServer(_args(data_parallel=4, model_parallel=2),
                           autostart=False)

    def _key(r):
        return (round(r["start"], 3), r["kind"],
                -1 if r["stream"] is None else r["stream"])

    try:
        assert msrv.engine.mesh is not None
        assert dict(msrv.engine.mesh.shape) == {"data": 4, "model": 2}
        sids_m = [msrv.open_session(target_wav=t) for t in fixtures["targets"]]
        sids_s = [server.open_session(target_wav=t) for t in fixtures["targets"]]
        for sid_m, sid_s, mix in zip(sids_m, sids_s, fixtures["mixes"]):
            msrv.add_audio(sid_m, mix)
            server.add_audio(sid_s, mix)
        assert msrv.step() == 2    # both sessions in ONE sharded tick
        assert server.step() == 2
        for sid_m, sid_s in zip(sids_m, sids_s):
            got_m = sorted(msrv.get_results(sid_m), key=_key)
            got_s = sorted(server.get_results(sid_s), key=_key)
            assert len(got_m) == len(got_s) >= 1
            for a, b in zip(got_m, got_s):
                assert (a["kind"], a["stream"], a["text"]) == \
                    (b["kind"], b["stream"], b["text"])
                assert abs(a["sv_score"] - b["sv_score"]) < 5e-3
        for sid in sids_m:
            msrv.close_session(sid)
        for sid in sids_s:
            server.close_session(sid)
    finally:
        msrv.close()


def test_autostart_worker_end_to_end(fixtures):
    """The background tick thread drives the same path asynchronously."""
    srv = StreamingServer(_args(), autostart=True)
    try:
        sid = srv.open_session(target_wav=fixtures["targets"][0])
        srv.add_audio(sid, fixtures["mixes"][0])
        srv.drain(timeout=120)
        import time
        t0 = time.time()
        recs = []
        while time.time() - t0 < 60 and not recs:
            recs = srv.get_results(sid)
            time.sleep(0.05)
        assert recs
    finally:
        srv.close()


def test_serve_streams_cli(fixtures, tmp_path):
    from audio_classification_tpu.cli.serve_streams import main

    wavs = []
    for i, mix in enumerate(fixtures["mixes"]):
        p = tmp_path / f"call{i}.wav"
        write_wav(p, mix, SR)
        wavs.append(str(p))
    out = tmp_path / "records.jsonl"
    stats = main([
        "--wavs", *wavs,
        "--targets", *fixtures["targets"],
        "--sv-threshold", "-1",
        "--preset", "tiny",
        "--max-batch", "4",
        "--max-segment-sec", "8",
        "--out", str(out),
    ])
    assert stats["sessions"] == 2
    assert stats["ticks"] >= 1
    assert out.is_file() and out.read_text().strip()
