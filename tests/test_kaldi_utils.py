"""Shell-level tests of the Kaldi utility scripts in tools/kaldi_utils
(capability parity with the reference's tools/{parse_options.sh, run.pl,
filter_scp.pl, int2sym.pl, combine_data.sh})."""

import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
UTILS = os.path.join(REPO, "tools", "kaldi_utils")


def sh(cmd, **kw):
    return subprocess.run(
        cmd, capture_output=True, text=True, timeout=60, **kw
    )


def test_parse_options(tmp_path):
    script = tmp_path / "demo.sh"
    script.write_text(
        "#!/bin/bash\nnj=4\nlr=0.1\n"
        f". {UTILS}/parse_options.sh\n"
        'echo "nj=$nj lr=$lr rest=$@"\n'
    )
    r = sh(["bash", str(script), "--nj", "8", "--lr", "0.5", "pos1"])
    assert r.returncode == 0, r.stderr
    assert "nj=8 lr=0.5 rest=pos1" in r.stdout
    # unknown option fails loudly
    r = sh(["bash", str(script), "--bogus", "1"])
    assert r.returncode != 0


def test_run_pl(tmp_path):
    log = tmp_path / "log" / "echo.JOB.log"
    r = sh([f"{UTILS}/run.pl", "JOB=1:3", str(log), "echo", "job", "JOB"])
    assert r.returncode == 0, r.stderr
    for j in (1, 2, 3):
        text = open(str(log).replace("JOB", str(j))).read()
        assert f"job {j}" in text
    # failing job propagates
    r = sh([f"{UTILS}/run.pl", str(tmp_path / "fail.log"), "false"])
    assert r.returncode != 0


def test_filter_scp(tmp_path):
    ids = tmp_path / "ids"
    scp = tmp_path / "in.scp"
    ids.write_text("utt1\nutt3\n")
    scp.write_text("utt1 a\nutt2 b\nutt3 c\n")
    r = sh([f"{UTILS}/filter_scp.pl", str(ids), str(scp)])
    assert r.stdout == "utt1 a\nutt3 c\n"
    r = sh([f"{UTILS}/filter_scp.pl", "--exclude", str(ids), str(scp)])
    assert r.stdout == "utt2 b\n"


def test_int2sym(tmp_path):
    symtab = tmp_path / "words.txt"
    symtab.write_text("<eps> 0\nhello 1\nworld 2\n")
    data = tmp_path / "in.txt"
    data.write_text("utt1 1 2\n")
    r = sh([f"{UTILS}/int2sym.pl", "-f", "2-", str(symtab), str(data)])
    assert r.stdout == "utt1 hello world\n"


def test_combine_data(tmp_path):
    for name, utts in (("a", ["u1", "u2"]), ("b", ["u3"])):
        d = tmp_path / name
        d.mkdir()
        (d / "text").write_text("".join(f"{u} text-{u}\n" for u in utts))
        (d / "utt2spk").write_text("".join(f"{u} spk-{name}\n" for u in utts))
    dest = tmp_path / "comb"
    r = sh([f"{UTILS}/combine_data.sh", str(dest), str(tmp_path / "a"),
            str(tmp_path / "b")])
    assert r.returncode == 0, r.stderr
    assert open(dest / "text").read() == (
        "u1 text-u1\nu2 text-u2\nu3 text-u3\n"
    )
    assert "spk-a u1 u2" in open(dest / "spk2utt").read()
    # duplicate ids rejected
    r = sh([f"{UTILS}/combine_data.sh", str(tmp_path / "dup"),
            str(tmp_path / "a"), str(tmp_path / "a")])
    assert r.returncode != 0
