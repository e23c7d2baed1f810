"""WandbLogger contract tests against a fake wandb module: resume ids,
counter summaries, checkpoint artifacts, explicit (non-silent) degrade
(reference ``utils/logger/wandb.py:15-177``)."""

import os
import sys
import types

import pytest


class _FakeArtifact:
    def __init__(self, name, type):
        self.name = name
        self.type = type
        self.files = []
        self.dirs = []

    def add_file(self, p):
        self.files.append(p)

    def add_dir(self, p):
        self.dirs.append(p)

    def download(self, root):
        self.downloaded_to = root
        return root


class _FakeRun:
    def __init__(self, **kw):
        self.kw = kw
        self.id = kw.get("id") or "fake123"
        self.summary = {}
        self.logged = []
        self.artifacts = []
        self.finished = False

    def log(self, data, step=None):
        self.logged.append((step, dict(data)))

    def log_artifact(self, art):
        self.artifacts.append(art)

    def use_artifact(self, name):
        art = _FakeArtifact(name, "model")
        self.artifacts.append(art)
        return art

    def finish(self):
        self.finished = True


def _install_fake_wandb(monkeypatch):
    mod = types.ModuleType("wandb")
    mod.runs = []

    def init(**kw):
        run = _FakeRun(**kw)
        mod.runs.append(run)
        return run

    mod.init = init
    mod.Artifact = _FakeArtifact
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return mod


def test_wandb_logger_logs_and_resumes(monkeypatch, tmp_path):
    mod = _install_fake_wandb(monkeypatch)
    from tianshou_tpu.utils.logger import WandbLogger

    lg = WandbLogger(project="p", name="n", resume_id="abc", log_dir=str(tmp_path))
    assert lg.run_id == "abc"
    assert mod.runs[0].kw["resume"] == "allow"
    lg.log_test_data({"returns_mean": 1.5}, 100)
    assert mod.runs[0].logged[0][0] == 100

    ckpt = os.path.join(tmp_path, "ckpt.bin")
    open(ckpt, "wb").write(b"x" * 10)
    lg.save_data(3, 30000, 3000, save_checkpoint_fn=lambda e, s, g: ckpt)
    run = mod.runs[0]
    assert run.summary["save/env_step"] == 30000
    assert run.artifacts and run.artifacts[0].files == [ckpt]
    assert run.artifacts[0].name == "run_abc_checkpoint"

    epoch, env_step, grad_step = lg.restore_data()
    assert (epoch, env_step, grad_step) == (3, 30000, 3000)
    lg.finalize()
    assert run.finished


def test_wandb_missing_raises_unless_optional(monkeypatch, capsys):
    monkeypatch.setitem(sys.modules, "wandb", None)  # forces ImportError
    from tianshou_tpu.utils.logger import WandbLogger

    with pytest.raises(ImportError):
        WandbLogger()
    lg = WandbLogger(optional=True)
    assert lg.wandb_run is None
    assert "wandb not installed" in capsys.readouterr().err
    lg.log_train_data({"x": 1.0}, 1)  # no-op, no crash
    assert lg.restore_data() == (0, 0, 0)
    lg.finalize()
