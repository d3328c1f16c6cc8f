"""bsgsd-parity network service: wire protocol + solve round trip."""

import socket
import threading

import pytest

from keyhuntm1cpu_tpu.engine.bsgs import BSGSEngine, BSGSParams, host_baby_table
from keyhuntm1cpu_tpu.ref import ecref
from keyhuntm1cpu_tpu.server import BSGSDServer, BSGSService

PARAMS = BSGSParams(m=512, block_u=16, steps_per_chunk=4, build_block=128, chain_len=8)


@pytest.fixture(scope="module")
def server():
    service = BSGSService(PARAMS, table=host_baby_table(PARAMS.m))
    srv = BSGSDServer(("127.0.0.1", 0), service)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address
    srv.shutdown()


def _request(addr, line: str) -> str:
    with socket.create_connection(addr, timeout=300) as s:
        s.sendall(line.encode() + b"\n")
        s.shutdown(socket.SHUT_WR)
        chunks = []
        while True:
            b = s.recv(4096)
            if not b:
                break
            chunks.append(b)
    return b"".join(chunks).decode()


def test_solve_request(server):
    key = 0xA1B2C3
    pub = ecref.serialize_pubkey(ecref.scalar_mult(key)).hex()
    resp = _request(server, f"{pub} a00000:b00000")
    assert int(resp, 16) == key


def test_not_found(server):
    pub = ecref.serialize_pubkey(ecref.scalar_mult(0xF00000)).hex()
    resp = _request(server, f"{pub} a00000:b00000")
    assert resp == "404 Not Found"


def test_bad_request(server):
    assert _request(server, "garbage") == "400 Bad Request"
    assert _request(server, "02aa bad:range") == "400 Bad Request"
    pub = ecref.serialize_pubkey(ecref.G).hex()
    assert _request(server, f"{pub} ff:01") == "400 Bad Request"


def test_request_deadline_returns_408():
    """A service with max_seconds=0 answers 408 at the deadline (NOT 404:
    the range was not exhaustively searched, so a bookkeeping client must
    not mark it cleared) instead of holding the search lock for the whole
    (huge) requested range."""
    service = BSGSService(PARAMS, table=host_baby_table(PARAMS.m),
                          warm=False, max_seconds=0.0)
    srv = BSGSDServer(("127.0.0.1", 0), service)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        key = 0xA1B2C3
        pub = ecref.serialize_pubkey(ecref.scalar_mult(key)).hex()
        resp = _request(srv.server_address, f"{pub} a00000:{'f'*12}")
        assert resp == "408 Request Timeout"
    finally:
        srv.shutdown()


def test_concurrent_requests_interleave():
    """Two concurrent clients: a small request queued behind a huge one
    completes in a few device turns instead of waiting out the whole
    huge range (the reference serves whole requests serially,
    bsgsd.cpp:1354-1378). The small request's latency must come in well
    under the big request's, and both answers must be correct."""
    import time

    service = BSGSService(PARAMS, table=host_baby_table(PARAMS.m),
                          warm=False, slice_chunks=1)
    srv = BSGSDServer(("127.0.0.1", 0), service)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        big_key = 0xBFD000  # near the end of a wide range
        small_key = 0xA00200  # near the start of a narrow range
        big_pub = ecref.serialize_pubkey(ecref.scalar_mult(big_key)).hex()
        small_pub = ecref.serialize_pubkey(ecref.scalar_mult(small_key)).hex()

        results = {}

        def ask(name, line):
            t0 = time.monotonic()
            results[name] = (_request(srv.server_address, line),
                             time.monotonic() - t0)

        t_big = threading.Thread(
            target=ask, args=("big", f"{big_pub} a00000:c00000"))
        t_big.start()
        time.sleep(0.3)  # let the big request take the device first
        t_small = threading.Thread(
            target=ask, args=("small", f"{small_pub} a00000:a08000"))
        t_small.start()
        t_small.join()
        small_resp, small_dt = results["small"]
        t_big.join()
        big_resp, big_dt = results["big"]

        assert int(small_resp, 16) == small_key
        assert int(big_resp, 16) == big_key
        # interleaving: the small request finished well before the big
        # one's total latency (serial execution would put it after)
        assert small_dt < 0.75 * big_dt, (small_dt, big_dt)
    finally:
        srv.shutdown()
