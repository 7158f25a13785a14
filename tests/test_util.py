import os
import time

import numpy as np

from bwtb3m_tpu.util.args import ArgInfo, ArgParser, parse_size
from bwtb3m_tpu.util.log import RealTimeClock, SizeMonitor, VerboseLog
from bwtb3m_tpu.util.serial import (read_number_map, write_number_map)
from bwtb3m_tpu.util.tmpfiles import (TempFileNameGenerator,
                                      TempFileRemovalContainer)


def test_parse_size_suffixes():
    assert parse_size("1024") == 1024
    assert parse_size("2k") == 2048
    assert parse_size("3m") == 3 * 1024 ** 2
    assert parse_size("2G") == 2 * 1024 ** 3
    assert parse_size("1.5g") == int(1.5 * 1024 ** 3)


def test_arginfo_parsing(tmp_path):
    f = tmp_path / "in.bin"
    f.write_bytes(b"x")
    ai = ArgInfo(["mem=2g", "bwtonly=1", str(f), "verbose=2"], "prog")
    assert ai.get_int("mem", 0) == 2 * 1024 ** 3
    assert ai.get_bool("bwtonly", False) is True
    assert ai.get_int("verbose", 0) == 2
    assert ai.restargs == [str(f)]
    name = ai.default_tmp_name()
    assert "prog" in name and str(os.getpid()) in name


def test_argparser_flags():
    ap = ArgParser(["-t4", "-T/tmp/prefix", "-test", "file.bwt", "-s8"])
    assert ap.get_int("t", 0) == 4
    assert ap.has("test")
    assert ap.get_int("s", 0) == 8
    assert ap.restargs == ["file.bwt"]


def test_tmpfile_generator(tmp_path):
    gen = TempFileNameGenerator(str(tmp_path / "sub" / "pfx"))
    a = gen.get("sort")
    b = gen.get()
    assert a != b and a.startswith(str(tmp_path / "sub" / "pfx"))
    open(a, "w").write("x")
    gen.cleanup()
    assert not os.path.exists(a)


def test_size_monitor(tmp_path):
    (tmp_path / "f1").write_bytes(b"x" * 1000)
    with SizeMonitor(str(tmp_path), interval=0.05) as mon:
        (tmp_path / "f2").write_bytes(b"y" * 5000)
        time.sleep(0.2)
    assert mon.peak >= 6000


def test_rtc_and_log(capsys):
    rtc = RealTimeClock()
    time.sleep(0.01)
    assert rtc.elapsed() > 0
    log = VerboseLog(2)
    with log.span("phase"):
        pass
    log.w("warn")
    err = capsys.readouterr().err
    assert "[V] phase" in err and "[W] warn" in err


def test_number_map_roundtrip(tmp_path):
    import io as _io
    buf = _io.BytesIO()
    m = {3: 10, 1: 5, 100: 1}
    write_number_map(buf, m)
    buf.seek(0)
    assert read_number_map(buf) == m
