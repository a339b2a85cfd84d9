"""Progress reporter for long offline jobs (the reference's tqdm analogue)."""
import logging as pylogging


def test_progress_lines_and_wrap(caplog):
    from tennis_tpu.utils import Progress

    p = Progress(100, "demo", unit="frames", interval=0.0)
    with caplog.at_level(pylogging.INFO, logger="absl"):
        p.update(30)
        p.update(90)  # chunked updates can overshoot the total
        line = p._line()
        p.close()
    assert "demo: 100/100 (100%)" in line  # clamped, never 120/100
    assert "frames/s" in line and "ETA" in line
    assert any("done in" in r.message for r in caplog.records)

    # interval gating: a huge interval emits no per-update lines
    caplog.clear()
    with caplog.at_level(pylogging.INFO, logger="absl"):
        q = Progress(10, "quiet", interval=3600.0)
        for _ in range(10):
            q.update()
    assert not caplog.records

    # wrap() yields every item and infers the total from len()
    items = list(Progress.wrap([1, 2, 3], "it", interval=3600.0))
    assert items == [1, 2, 3]

    # unknown-total iterables still work (no len())
    gen = (i for i in range(4))
    assert list(Progress.wrap(gen, "gen", interval=3600.0)) == [0, 1, 2, 3]
