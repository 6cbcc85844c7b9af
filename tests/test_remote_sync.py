"""Remote artifact sync tests with a mocked b2sdk (reference:
utils/backblaze.py:10-54 — sync invoked at end of training)."""

import sys
import types
from unittest.mock import MagicMock

from linnaeus_tpu.configuration import get_default_config


def _mock_b2(monkeypatch):
    bucket = MagicMock()
    api = MagicMock()
    api.get_bucket_by_name.return_value = bucket
    v2 = types.ModuleType("b2sdk.v2")
    v2.B2Api = MagicMock(return_value=api)
    v2.InMemoryAccountInfo = MagicMock()
    pkg = types.ModuleType("b2sdk")
    pkg.v2 = v2
    monkeypatch.setitem(sys.modules, "b2sdk", pkg)
    monkeypatch.setitem(sys.modules, "b2sdk.v2", v2)
    return api, bucket


def test_sync_to_bucket_uploads_all_files(tmp_path, monkeypatch):
    api, bucket = _mock_b2(monkeypatch)
    (tmp_path / "sub").mkdir()
    (tmp_path / "a.txt").write_text("a")
    (tmp_path / "sub" / "b.txt").write_text("b")

    cfg = get_default_config()
    cfg.ENV.OUTPUT.BUCKET.ENABLED = True
    cfg.ENV.OUTPUT.BUCKET.BUCKET = "mybucket"
    cfg.ENV.OUTPUT.BUCKET.APP_KEY_ID = "k"
    cfg.ENV.OUTPUT.BUCKET.APP_KEY = "s"

    from linnaeus_tpu.utils.remote_sync import sync_to_bucket

    assert sync_to_bucket(cfg, str(tmp_path)) is True
    api.authorize_account.assert_called_once()
    uploaded = {
        call.args[1] for call in bucket.upload_local_file.call_args_list
    }
    assert uploaded == {"a.txt", "sub/b.txt"}


def test_sync_to_bucket_disabled_is_noop(tmp_path, monkeypatch):
    api, bucket = _mock_b2(monkeypatch)
    cfg = get_default_config()
    cfg.ENV.OUTPUT.BUCKET.ENABLED = False

    from linnaeus_tpu.utils.remote_sync import sync_to_bucket

    assert sync_to_bucket(cfg, str(tmp_path)) is False
    bucket.upload_local_file.assert_not_called()


def test_trainer_sync_outputs_gated(monkeypatch, tmp_path):
    """Trainer._sync_outputs calls sync_to_bucket with the experiment base
    dir when enabled (wiring regression: sync had zero call sites)."""
    from linnaeus_tpu.train.loop import Trainer

    cfg = get_default_config()
    cfg.ENV.OUTPUT.BUCKET.ENABLED = True
    cfg.ENV.OUTPUT.DIRS.EXP_BASE = str(tmp_path)

    calls = []
    import linnaeus_tpu.utils.remote_sync as rs

    monkeypatch.setattr(
        rs, "sync_to_bucket", lambda c, d: calls.append(d) or True
    )
    dummy = object.__new__(Trainer)  # no full Trainer build needed
    dummy.config = cfg
    Trainer._sync_outputs(dummy)
    assert calls == [str(tmp_path)]

    cfg.ENV.OUTPUT.BUCKET.ENABLED = False
    Trainer._sync_outputs(dummy)
    assert calls == [str(tmp_path)]  # still one call


def test_sync_to_bucket_incremental(tmp_path, monkeypatch):
    """Second sync of an unchanged tree uploads nothing; touched files
    re-upload (guards the per-checkpoint full-reupload regression)."""
    import os
    import time

    from linnaeus_tpu.utils import remote_sync as rs

    uploads = []

    class FakeBucket:
        def upload_local_file(self, path, rel):
            uploads.append(rel)

    class FakeApi:
        def __init__(self, *a, **k):
            pass

        def authorize_account(self, *a, **k):
            pass

        def get_bucket_by_name(self, name):
            return FakeBucket()

    import types, sys

    fake = types.ModuleType("b2sdk.v2")
    fake.B2Api = FakeApi
    fake.InMemoryAccountInfo = object
    monkeypatch.setitem(sys.modules, "b2sdk", types.ModuleType("b2sdk"))
    monkeypatch.setitem(sys.modules, "b2sdk.v2", fake)

    from linnaeus_tpu.configuration import get_default_config

    cfg = get_default_config()
    cfg.ENV.OUTPUT.BUCKET.ENABLED = True
    cfg.ENV.OUTPUT.BUCKET.BUCKET = "b"
    cfg.ENV.OUTPUT.BUCKET.APP_KEY_ID = "k"
    cfg.ENV.OUTPUT.BUCKET.APP_KEY = "s"

    d = tmp_path / "exp"
    d.mkdir()
    (d / "a.txt").write_text("1")
    (d / "b.txt").write_text("2")
    rs._last_sync_mtime.pop(str(d), None)
    assert rs.sync_to_bucket(cfg, str(d)) is True
    assert sorted(uploads) == ["a.txt", "b.txt"]

    uploads.clear()
    assert rs.sync_to_bucket(cfg, str(d)) is True
    assert uploads == []  # nothing changed

    time.sleep(0.01)
    (d / "a.txt").write_text("3")
    os.utime(d / "a.txt")
    assert rs.sync_to_bucket(cfg, str(d)) is True
    assert uploads == ["a.txt"]
