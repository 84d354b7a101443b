import pytest

from termdaw_tpu.config import Config, WorkFlow


def test_defaults(tmp_path):
    p = tmp_path / "project.toml"
    p.write_text('[project]\n[settings]\nmain = "project.lua"\n')
    cfg = Config.read(p)
    assert cfg.project.name == "unnamed"
    assert cfg.settings.buffer_length == 1024
    assert cfg.settings.project_samplerate == 44100
    assert cfg.settings.workflow == WorkFlow.MANUAL
    assert cfg.settings.main == "project.lua"


def test_full(tmp_path):
    p = tmp_path / "project.toml"
    p.write_text(
        '[project]\nname = "Example Project"\n'
        '[settings]\nmain = "examples/stream.lua"\nbuffer_length = 512\n'
        'project_samplerate = 48000\nworkflow = "stream"\n'
    )
    cfg = Config.read(p)
    assert cfg.project.name == "Example Project"
    assert cfg.settings.buffer_length == 512
    assert cfg.settings.project_samplerate == 48000
    assert cfg.settings.workflow == WorkFlow.STREAM


def test_unknown_workflow_falls_back_to_manual(tmp_path):
    p = tmp_path / "project.toml"
    p.write_text('[settings]\nmain = "x.lua"\nworkflow = "whatever"\n')
    assert Config.read(p).settings.workflow == WorkFlow.MANUAL


def test_missing_main(tmp_path):
    p = tmp_path / "project.toml"
    p.write_text("[settings]\n")
    with pytest.raises(KeyError):
        Config.read(p)
