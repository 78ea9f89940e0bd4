"""Discovery semantics from the reference (main.py:144-194, tests pinned
in tests/test_load.py:73-120 and tests/test_unzip.py:28-50)."""

from __future__ import annotations

import zipfile

from postgresimporter_spark.discovery import discover_csvs, discover_zips


def make_tree(tmp_path):
    jan = tmp_path / "2019 - 01"
    feb = tmp_path / "2019 - 02"
    jan.mkdir()
    feb.mkdir()
    files = [
        jan / "running_jan19.csv",
        jan / "timetables_jan19.csv",
        jan / "train_jan19.csv",
        jan / "running_jan10_sample.csv",
        feb / "running_feb19.csv",
        feb / "timetables_feb19.csv",
        feb / "train_feb19.csv",
        feb / "timetables_jan19_sample.csv",
    ]
    for f in files:
        f.write_text("a,b\n1,2\n")
    return files


def test_discover_and_group(tmp_path):
    make_tree(tmp_path)
    d = discover_csvs([tmp_path], exclude_regex=r"^.*sample.*$")
    assert len(d.dump_files) == 6
    assert set(d.table_csv_files) == {"running", "timetables", "train"}
    assert [f.name for f in d.table_csv_files["running"]] == [
        "running_jan19.csv",
        "running_feb19.csv",
    ] or [f.name for f in sorted(d.table_csv_files["running"])] == sorted(
        ["running_jan19.csv", "running_feb19.csv"]
    )


def test_exclude_regex_is_match_anchored(tmp_path):
    (tmp_path / "keep_sample_suffix.csv").write_text("a\n")
    (tmp_path / "other.csv").write_text("a\n")
    # Anchored regex that doesn't match from the start excludes nothing.
    d = discover_csvs([tmp_path], exclude_regex=r"sample")
    assert len(d.dump_files) == 2
    d = discover_csvs([tmp_path], exclude_regex=r"^keep.*$")
    assert [f.name for f in d.dump_files] == ["other.csv"]


def test_literal_csv_path(tmp_path):
    f = tmp_path / "solo_1.csv"
    f.write_text("a\n1\n")
    d = discover_csvs([f])
    assert d.table_csv_files == {"solo": [f]}


def test_zip_discovery_and_skip(tmp_path):
    z1 = tmp_path / "a.b.zip"
    z2 = tmp_path / "x_y_z.zip"
    for z in (z1, z2):
        with zipfile.ZipFile(z, "w") as zf:
            zf.writestr("inner.csv", "a\n1\n")
    # a.b already extracted -> skipped (reference main.py:156-160)
    (tmp_path / "a.b").mkdir()
    jobs = discover_zips([tmp_path])
    assert [j.src.name for j in jobs] == ["x_y_z.zip"]
    assert jobs[0].dest == tmp_path / "x_y_z"
    # --all reprocesses everything
    jobs_all = discover_zips([tmp_path], process_all=True)
    assert [j.src.name for j in jobs_all] == ["a.b.zip", "x_y_z.zip"]


def test_uppercase_zip_ignored(tmp_path):
    z = tmp_path / "upper.ZIP"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("inner.csv", "a\n")
    assert discover_zips([tmp_path]) == []
