"""API contract tests (reference schema: main.py:605-615 and validation
envelope main.py:551-582), driven over real HTTP against the
dependency-free stdlib server. A FastAPI TestClient variant runs when
fastapi is installed."""

import base64
import threading

import numpy as np
import pytest
import requests

from airfoil_tpu.api.minihttp import make_server
from airfoil_tpu.models import naca4


@pytest.fixture(scope="module")
def base_url():
    # Rate limiting off: these tests hammer the endpoints far past the
    # per-IP budgets (a dedicated test covers the limiter itself).
    httpd = make_server(host="127.0.0.1", port=0, rate_limit=False)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def dat_bytes(coords, header="TEST AIRFOIL"):
    lines = [header] + [f" {x:.6f} {y:.6f}" for x, y in coords]
    return "\n".join(lines).encode()


@pytest.fixture(scope="module")
def naca2412_dat():
    return dat_bytes(naca4(2, 4, 12, 60))


class TestBasics:
    def test_root(self, base_url):
        r = requests.get(base_url + "/")
        assert r.status_code == 200
        assert r.json()["status"] == "ok"

    def test_health(self, base_url):
        r = requests.get(base_url + "/health")
        assert r.status_code == 200
        body = r.json()
        assert body["status"] in ("healthy", "degraded")
        assert "backend" in body

    def test_health_head(self, base_url):
        assert requests.head(base_url + "/health").status_code == 200

    def test_unknown_route(self, base_url):
        assert requests.get(base_url + "/nope").status_code == 404

    def test_static_app_served(self, base_url):
        r = requests.get(base_url + "/app")
        assert r.status_code == 200
        assert "<html" in r.text.lower()


class TestValidation:
    def _post(self, base_url, data, files):
        return requests.post(base_url + "/upload_airfoil/",
                             data=data, files=files, timeout=300)

    def test_reynolds_out_of_range(self, base_url, naca2412_dat):
        r = self._post(base_url, {"reynolds": 1e3, "alpha": 5},
                       {"file": ("a.dat", naca2412_dat)})
        assert r.status_code == 400
        assert "Reynolds" in r.json()["detail"]

    def test_alpha_out_of_range(self, base_url, naca2412_dat):
        r = self._post(base_url, {"reynolds": 1e6, "alpha": 45},
                       {"file": ("a.dat", naca2412_dat)})
        assert r.status_code == 400
        assert "Alpha" in r.json()["detail"]

    def test_wrong_extension(self, base_url, naca2412_dat):
        r = self._post(base_url, {"reynolds": 1e6, "alpha": 5},
                       {"file": ("a.txt", naca2412_dat)})
        assert r.status_code == 400
        assert ".dat" in r.json()["detail"]

    def test_garbage_file(self, base_url):
        r = self._post(base_url, {"reynolds": 1e6, "alpha": 5},
                       {"file": ("a.dat", b"not an airfoil at all")})
        assert r.status_code == 400
        assert "Insufficient" in r.json()["detail"]

    def test_multi_element_rejected(self, base_url):
        loop = naca4(2, 4, 12, 40)
        double = np.concatenate([loop, loop])
        r = self._post(base_url, {"reynolds": 1e6, "alpha": 5},
                       {"file": ("a.dat", dat_bytes(double))})
        assert r.status_code == 400
        assert "Multi-element" in r.json()["detail"]

    def test_missing_field(self, base_url, naca2412_dat):
        r = requests.post(base_url + "/upload_airfoil/",
                          data={"reynolds": 1e6},
                          files={"file": ("a.dat", naca2412_dat)})
        assert r.status_code == 400
        assert "alpha" in r.json()["detail"]


@pytest.mark.slow
class TestAnalysis:
    def test_upload_airfoil_schema(self, base_url, naca2412_dat):
        r = requests.post(base_url + "/upload_airfoil/",
                          data={"reynolds": 1e6, "alpha": 4.0},
                          files={"file": ("naca2412.dat", naca2412_dat)},
                          timeout=600)
        assert r.status_code == 200, r.text
        body = r.json()
        # Reference response schema, main.py:605-615.
        assert set(body) == {
            "success", "coords_before", "coords_after", "num_points",
            "cp_x", "cp_values", "coefficients", "bl_data", "parser_fixes",
        }
        assert body["success"] is True
        assert body["num_points"] == len(body["coords_after"])
        assert len(body["cp_x"]) == len(body["cp_values"]) > 100
        c = body["coefficients"]
        assert c["mode"] in ("viscous", "inviscid")
        assert 0.5 < c["CL"] < 0.9
        if c["mode"] == "viscous":
            assert 0.004 < c["CD"] < 0.02
            bl = body["bl_data"]
            assert bl["upper"] and bl["lower"]

    def test_polar_endpoint(self, base_url, naca2412_dat):
        r = requests.post(base_url + "/polar/",
                          data={"reynolds": 1e6, "alpha_start": -2,
                                "alpha_end": 6, "alpha_step": 2},
                          files={"file": ("naca2412.dat", naca2412_dat)},
                          timeout=600)
        assert r.status_code == 200, r.text
        body = r.json()
        assert len(body["polar"]) == 5
        cls = [p["CL"] for p in body["polar"]]
        assert all(np.diff(cls) > 0)
        assert {"alpha", "CL", "CD", "CDp", "Cm", "mode", "converged",
                "xtr_upper", "xtr_lower", "sep_fraction"} \
            <= set(body["polar"][0])
        # The per-point strategy enum is reported faithfully — Strategy 2
        # must surface as "viscous_smoothed", never flattened to "viscous".
        assert all(p["mode"] in ("viscous", "viscous_smoothed", "inviscid")
                   for p in body["polar"])
        assert all(0.0 <= p["sep_fraction"] <= 1.0 for p in body["polar"])


class TestLBM:
    def test_session_lifecycle(self, base_url, naca2412_dat):
        r = requests.post(base_url + "/lbm/start",
                          data={"alpha": 6.0},
                          files={"file": ("naca2412.dat", naca2412_dat)},
                          timeout=600)
        assert r.status_code == 200, r.text
        meta = r.json()
        session = meta["session"]
        assert meta["grid"][0] > 0 and meta["grid"][1] > 0

        r2 = requests.post(base_url + "/lbm/frame",
                           data={"session": session,
                                 "fields": "speed,ux,uy"}, timeout=600)
        assert r2.status_code == 200, r2.text
        frame = r2.json()
        assert frame["step"] > 0
        assert "speed" in frame["fields"]
        buf = base64.b64decode(frame["fields"]["speed"]["data"])
        arr = np.frombuffer(buf, np.float32)
        assert arr.size == meta["grid"][0] * meta["grid"][1]

        r3 = requests.post(base_url + "/lbm/frame",
                           data={"session": session, "alpha": 12.0,
                                 "fields": "speed"}, timeout=600)
        assert r3.status_code == 200
        assert r3.json()["alpha"] == 12.0

        r4 = requests.post(base_url + "/lbm/stop",
                           data={"session": session})
        assert r4.status_code == 200
        r5 = requests.post(base_url + "/lbm/frame",
                           data={"session": session})
        assert r5.status_code == 404


@pytest.mark.slow
class TestBatch:
    def test_batch_repeated_files_fields(self, base_url, naca2412_dat):
        # The /batch/ contract: N multipart parts all named "files"
        # (matches the FastAPI transport's list[UploadFile] binding).
        naca0012 = dat_bytes(naca4(0, 0, 12, 60))
        r = requests.post(
            base_url + "/batch/",
            data={"reynolds": 1e6, "alpha": 4.0},
            files=[("files", ("naca2412.dat", naca2412_dat)),
                   ("files", ("naca0012.dat", naca0012))],
            timeout=600)
        assert r.status_code == 200, r.text
        body = r.json()
        assert len(body["results"]) == 2
        names = [row["file"] for row in body["results"]]
        assert names == ["naca2412.dat", "naca0012.dat"]
        cls = [row["CL"] for row in body["results"]]
        assert cls[0] > cls[1]  # cambered lifts more than symmetric

    def test_batch_legacy_field_names(self, base_url, naca2412_dat):
        # Legacy file0..fileN posts still work (flattened in sorted order).
        r = requests.post(
            base_url + "/batch/",
            data={"reynolds": 1e6, "alpha": 4.0},
            files=[("file0", ("a.dat", naca2412_dat))],
            timeout=600)
        assert r.status_code == 200, r.text
        assert len(r.json()["results"]) == 1


class TestRateLimit:
    def test_solve_posts_limited(self):
        httpd = make_server(host="127.0.0.1", port=0)  # limiter ON
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            url = f"http://127.0.0.1:{port}"
            # Reference budget: 5 solver posts per minute per IP
            # (main.py:544). The 6th must 429 before parsing the body.
            codes = []
            for _ in range(6):
                r = requests.post(url + "/upload_airfoil/",
                                  data={"reynolds": 1e6, "alpha": 200.0},
                                  files={"file": ("a.dat", b"bad")},
                                  timeout=30)
                codes.append(r.status_code)
            assert codes[:5] == [400] * 5
            assert codes[5] == 429
            # Health has its own, larger budget — still open.
            assert requests.get(url + "/health").status_code == 200
        finally:
            httpd.shutdown()


@pytest.mark.slow
class TestFastAPIVariant:
    def test_fastapi_app_when_available(self, naca2412_dat):
        try:
            from fastapi.testclient import TestClient
            from airfoil_tpu.api.server import create_app
        except ImportError:
            pytest.skip("fastapi not installed in this image")
        client = TestClient(create_app())
        assert client.get("/").status_code == 200
        r = client.post("/upload_airfoil/",
                        files={"file": ("a.dat", naca2412_dat)},
                        data={"reynolds": 1e6, "alpha": 4.0})
        assert r.status_code == 200

    def test_fastapi_batch_repeated_files(self, naca2412_dat):
        try:
            from fastapi.testclient import TestClient
            from airfoil_tpu.api.server import create_app
        except ImportError:
            pytest.skip("fastapi not installed in this image")
        client = TestClient(create_app())
        r = client.post(
            "/batch/",
            files=[("files", ("naca2412.dat", naca2412_dat)),
                   ("files", ("naca0012.dat", dat_bytes(naca4(0, 0, 12, 60))))],
            data={"reynolds": 1e6, "alpha": 4.0})
        assert r.status_code == 200, r.text
        assert len(r.json()["results"]) == 2
