"""Kill-and-resume position checkpoints for brute / vanity / minikeys.

(BSGS resume is covered in test_bsgs.py.) Each test runs a partial search
with a checkpoint, then a FRESH engine resumes from the file: the resumed
run must skip the already-covered region (the early planted key is not
re-found) and continue into new territory (the late planted key is).
"""

import pytest

from keyhuntm1cpu_tpu.core.checkpoint import CheckpointManager
from keyhuntm1cpu_tpu.engine.brute import BruteEngine, BruteParams
from keyhuntm1cpu_tpu.engine.minikeys import MinikeyEngine, MinikeyParams
from keyhuntm1cpu_tpu.engine.vanity import VanityEngine, VanityParams
from keyhuntm1cpu_tpu.ref import ecref, hashref
from keyhuntm1cpu_tpu.utils.targets import TargetSet, targets_from_ints

PARAMS = BruteParams(walkers=2, block_u=32, steps_per_chunk=2, chain_len=8)


def _targets(keys):
    raw = [hashref.pubkey_to_hash160(ecref.scalar_mult(k), True) for k in keys]
    return TargetSet(kind="hash160", raw=raw, labels=[str(k) for k in keys])


def test_brute_checkpoint_resume(tmp_path):
    path = str(tmp_path / "ck.json")
    # walkers=2 over [1, 521): slice_len 260 -> walker windows of 65 keys;
    # early keys land in the first chunks, late keys in the last
    ts = _targets([40, 250])
    eng = BruteEngine(ts, 1, 521, mode="rmd160", params=PARAMS)
    f1 = eng.search(
        max_steps=2, stop_on_first=False,
        checkpoint=CheckpointManager(path, every_s=0),
    )
    ck = CheckpointManager(path).load()
    assert ck is not None and ck.chunks_done == 2
    got1 = {f.private_key for f in f1}
    assert 40 in got1  # early key covered by the partial run
    assert f"{40:x}" in ck.found  # persisted, crash-proof

    eng2 = BruteEngine(ts, 1, 521, mode="rmd160", params=PARAMS)
    f2 = eng2.search(
        stop_on_first=False, checkpoint=CheckpointManager(path, every_s=0),
    )
    got2 = {f.private_key for f in f2}
    # the covered region is skipped, but its PERSISTED find is
    # re-surfaced in the return value: the CLI writes
    # KEYFOUNDKEYFOUND.txt from the return value only, so without this
    # a preempted --all run's keys existed solely inside the checkpoint
    assert 40 in got2
    assert 250 in got2  # and the rest of the range was searched
    assert CheckpointManager(path).load().chunks_done >= eng2.steps_per_walker


def test_brute_checkpoint_mismatch_raises(tmp_path):
    from keyhuntm1cpu_tpu.core.errors import CheckpointError

    path = str(tmp_path / "ck.json")
    ts = _targets([40])
    eng = BruteEngine(ts, 1, 521, mode="rmd160", params=PARAMS)
    eng.search(max_steps=2, checkpoint=CheckpointManager(path, every_s=0))
    other = BruteEngine(ts, 1, 1041, mode="rmd160", params=PARAMS)
    with pytest.raises(CheckpointError):
        other.search(checkpoint=CheckpointManager(path, every_s=0))


def test_vanity_checkpoint_resume(tmp_path):
    path = str(tmp_path / "ck.json")
    # find a key whose address prefix is searchable in a tiny range
    params = VanityParams(walkers=2, block_u=16, steps_per_chunk=2, chain_len=8)
    addr = hashref.pubkey_to_address(ecref.scalar_mult(200), compressed=True)
    pref = addr[:6]
    eng = VanityEngine([pref], 1, 265, params=params)
    eng.search(max_steps=2, checkpoint=CheckpointManager(path, every_s=0))
    ck = CheckpointManager(path).load()
    assert ck is not None and ck.chunks_done == 2

    eng2 = VanityEngine([pref], 1, 265, params=params)
    f2 = eng2.search(
        stop_on_first=False, checkpoint=CheckpointManager(path, every_s=0)
    )
    # key 200 is late in the range; the resumed run reaches it
    assert 200 in {f.private_key for f in f2}


def test_minikeys_checkpoint_resume(tmp_path):
    path = str(tmp_path / "ck.json")
    prefix = "SkeyhuntTPUx"[:12]
    # find a valid minikey beyond the first chunk
    from keyhuntm1cpu_tpu.engine.minikeys import _b58_digits, LOW_SPAN

    def mk_of(c):
        return prefix + _b58_digits(c // LOW_SPAN, 5) + _b58_digits(c % LOW_SPAN, 5)

    c = 256  # search beyond chunk 0 (batch = 256)
    while hashref.sha256((mk_of(c) + "?").encode())[0] != 0:
        c += 1
    k = int.from_bytes(hashref.sha256(mk_of(c).encode()), "big")
    ts = targets_from_ints(
        "hash160",
        [hashref.pubkey_to_hash160(ecref.scalar_mult(k), compressed=False)],
    )
    params = MinikeyParams(batch=256, valid_max=64, chain_len=8)
    eng = MinikeyEngine(ts, prefix=prefix, params=params)
    eng.search(max_chunks=1, checkpoint=CheckpointManager(path, every_s=0))
    ck = CheckpointManager(path).load()
    assert ck is not None and ck.extra["counter"] == 256

    # resume with a FRESH engine (random prefix is overridden by the file)
    eng2 = MinikeyEngine(ts, params=params)
    f2 = eng2.search(
        max_chunks=(c - 256) // 256 + 1,
        checkpoint=CheckpointManager(path, every_s=0),
    )
    assert eng2.prefix == prefix  # adopted from the checkpoint
    assert [f.private_key for f in f2] == [k]


def test_sigterm_graceful_stop_saves_checkpoint(tmp_path):
    """SIGTERM mid-run: the process stops at a chunk boundary, saves the
    position checkpoint, and exits cleanly (in-process replacement for
    the reference's ops-script trap, vastai_deploy.sh:88-106)."""
    import json
    import os
    import signal
    import subprocess
    import sys
    import time

    from keyhuntm1cpu_tpu.ref import ecref, hashref

    h = hashref.pubkey_to_hash160(ecref.scalar_mult(0x7FFFFF0), True)
    rmd = tmp_path / "t.rmd"
    rmd.write_text(h.hex() + "\n")
    ck = tmp_path / "ck.json"
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH="/root/repo")
    proc = subprocess.Popen(
        [sys.executable, "-m", "keyhuntm1cpu_tpu.cli", "-m", "rmd160",
         "-f", str(rmd), "-r", "100000:8000000", "-w", "2", "-u", "32",
         "--chunk-steps", "2", "--checkpoint", str(ck),
         "--checkpoint-every", "0"],
        cwd=tmp_path, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    # wait until at least one chunk committed (checkpoint file exists)
    deadline = time.time() + 240
    while time.time() < deadline and not ck.exists():
        time.sleep(0.5)
        assert proc.poll() is None, proc.communicate()[0][-2000:]
    assert ck.exists(), "no checkpoint before signal"
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=120)
    assert proc.returncode in (0, 1), out[-2000:]
    assert "stop requested" in out
    saved = json.loads(ck.read_text())["payload"]
    assert saved["keys_covered"] > 0
