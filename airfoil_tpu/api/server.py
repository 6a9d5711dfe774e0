"""FastAPI transport for the API (optional dependency).

Endpoint-for-endpoint port of the reference backend (main.py:522-634) plus
the TPU-native extensions (one-dispatch ``/polar/``, LBM wind-tunnel
streaming). All logic lives in ``handlers``; this module only adapts it to
FastAPI/Starlette. Rate limiting matches the reference's slowapi budget
(root 10/min, health 20/min, upload 5/min — main.py:523,531,544) when
slowapi is installed.

When FastAPI is not installed (minimal images), use the dependency-free
server instead: ``python -m airfoil_tpu.api.minihttp`` — same routes.
"""

from __future__ import annotations

import asyncio
import logging

from airfoil_tpu import config
from airfoil_tpu.api import handlers
from airfoil_tpu.api.handlers import ApiError, LBMSessions

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s [%(levelname)s] %(name)s: %(message)s",
    datefmt="%Y-%m-%d %H:%M:%S",
)
logger = logging.getLogger(__name__)

try:  # pragma: no cover - optional dependency probe
    from fastapi import FastAPI, Form, HTTPException, Request, UploadFile

    HAVE_FASTAPI = True
except ImportError:  # pragma: no cover
    HAVE_FASTAPI = False

if HAVE_FASTAPI:
    from fastapi.middleware.cors import CORSMiddleware

    try:  # pragma: no cover
        from slowapi import Limiter, _rate_limit_exceeded_handler
        from slowapi.errors import RateLimitExceeded
        from slowapi.util import get_remote_address

        _limiter = Limiter(key_func=get_remote_address)

        def _limit(spec):
            return _limiter.limit(spec)

        _HAVE_SLOWAPI = True
    except Exception:  # pragma: no cover
        _limiter = None
        _HAVE_SLOWAPI = False

        def _limit(_spec):
            def deco(fn):
                return fn
            return deco

    def create_app() -> "FastAPI":
        app = FastAPI(title="Airfoil TPU CFD API")

        @app.on_event("startup")
        async def _warm():
            handlers.start_warmup()
        if _HAVE_SLOWAPI:
            app.state.limiter = _limiter
            app.add_exception_handler(RateLimitExceeded,
                                      _rate_limit_exceeded_handler)
        app.add_middleware(
            CORSMiddleware,
            allow_origins=config.ALLOWED_ORIGINS,
            allow_credentials=True,
            allow_methods=["GET", "POST", "HEAD"],
            allow_headers=["*"],
        )
        semaphore = asyncio.Semaphore(config.MAX_CONCURRENT_SOLVES)
        sessions = LBMSessions()

        def _unwrap(fn, *args):
            try:
                status, payload = fn(*args)
            except ApiError as e:
                raise HTTPException(status_code=e.status_code,
                                    detail=e.detail)
            if status != 200:
                raise HTTPException(status_code=status,
                                    detail=payload.get("detail", ""))
            return payload

        @app.get("/")
        @_limit("10/minute")
        async def root(request: Request):
            return _unwrap(handlers.handle_root)

        @app.head("/health")
        @app.get("/health")
        @_limit("20/minute")
        async def health(request: Request):
            return _unwrap(handlers.handle_health)

        @app.get("/stats")
        async def stats(request: Request):
            return _unwrap(handlers.handle_stats)

        @app.post("/upload_airfoil/")
        @_limit("5/minute")
        async def upload_airfoil(request: Request, file: UploadFile,
                                 reynolds: float = Form(...),
                                 alpha: float = Form(...)):
            from anyio import to_thread

            content = await file.read()
            async with semaphore:
                return await to_thread.run_sync(
                    lambda: _unwrap(handlers.handle_upload, file.filename,
                                    content, reynolds, alpha))

        @app.post("/polar/")
        @_limit("5/minute")
        async def polar(request: Request, file: UploadFile,
                        reynolds: float = Form(...),
                        alpha_start: float = Form(...),
                        alpha_end: float = Form(...),
                        alpha_step: float = Form(1.0)):
            from anyio import to_thread

            content = await file.read()
            async with semaphore:
                return await to_thread.run_sync(
                    lambda: _unwrap(handlers.handle_polar, file.filename,
                                    content, reynolds, alpha_start,
                                    alpha_end, alpha_step))

        @app.post("/batch/")
        @_limit("5/minute")
        async def batch(request: Request, files: list[UploadFile],
                        reynolds: float = Form(...),
                        alpha: float = Form(...)):
            from anyio import to_thread

            pairs = [(f.filename, await f.read()) for f in files]
            async with semaphore:
                return await to_thread.run_sync(
                    lambda: _unwrap(handlers.handle_batch, pairs,
                                    reynolds, alpha))

        @app.post("/lbm/start")
        @_limit("10/minute")
        async def lbm_start(request: Request, file: UploadFile,
                            alpha: float = Form(6.0)):
            from anyio import to_thread

            content = await file.read()
            async with semaphore:
                return await to_thread.run_sync(
                    lambda: _unwrap(sessions.start, file.filename, content,
                                    alpha))

        @app.post("/lbm/frame")
        async def lbm_frame(request: Request, session: str = Form(...),
                            alpha: float | None = Form(None),
                            u0: float | None = Form(None),
                            fields: str = Form("speed")):
            from anyio import to_thread

            return await to_thread.run_sync(
                lambda: _unwrap(sessions.frame, session, alpha, u0, fields))

        @app.post("/lbm/stop")
        async def lbm_stop(request: Request, session: str = Form(...)):
            return _unwrap(sessions.stop, session)

        return app

    app = create_app()
else:  # pragma: no cover
    def create_app():
        raise ImportError(
            "FastAPI is not installed. Use the dependency-free server: "
            "python -m airfoil_tpu.api.minihttp")

    app = None


if __name__ == "__main__":
    if HAVE_FASTAPI:
        try:
            import uvicorn

            uvicorn.run(app, host="0.0.0.0", port=config.PORT)
        except ImportError:
            from airfoil_tpu.api.minihttp import serve

            serve()
    else:
        from airfoil_tpu.api.minihttp import serve

        serve()
