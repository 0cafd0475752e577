"""Materialize Group-A fixtures as parquet under fixtures/ (seed=42).

Usage: python tools/gen_fixtures.py [out_dir]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, ".")

from pg2kinesis_spark import fixtures as fx


def write(out_dir: str, name: str, cols: dict) -> None:
    pq.write_table(pa.table(cols), os.path.join(out_dir, f"{name}.parquet"))
    print(f"wrote {name}: {len(next(iter(cols.values())))} rows")


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "fixtures"
    os.makedirs(out, exist_ok=True)

    rows = fx.pk_catalog_rows()
    write(
        out,
        "pk_catalog",
        {
            "table_name": pa.array([r[0] for r in rows], pa.string()),
            "col_name": pa.array([r[1] for r in rows], pa.string()),
            "col_type": pa.array([r[2] for r in rows], pa.string()),
            "col_ord_pos": pa.array([r[3] for r in rows], pa.int32()),
        },
    )

    info = fx.info_schema_rows()
    write(out, "info_tables", {
        "table_catalog": [r[0] for r in info["tables"]],
        "table_schema": [r[1] for r in info["tables"]],
        "table_name": [r[2] for r in info["tables"]],
        "table_type": [r[3] for r in info["tables"]],
    })
    write(out, "info_table_constraints", {
        "constraint_catalog": [r[0] for r in info["table_constraints"]],
        "constraint_schema": [r[1] for r in info["table_constraints"]],
        "constraint_name": [r[2] for r in info["table_constraints"]],
        "table_catalog": [r[3] for r in info["table_constraints"]],
        "table_schema": [r[4] for r in info["table_constraints"]],
        "table_name": [r[5] for r in info["table_constraints"]],
        "constraint_type": [r[6] for r in info["table_constraints"]],
    })
    write(out, "info_key_column_usage", {
        "constraint_catalog": [r[0] for r in info["key_column_usage"]],
        "constraint_schema": [r[1] for r in info["key_column_usage"]],
        "constraint_name": [r[2] for r in info["key_column_usage"]],
        "table_catalog": [r[3] for r in info["key_column_usage"]],
        "table_schema": [r[4] for r in info["key_column_usage"]],
        "table_name": [r[5] for r in info["key_column_usage"]],
        "column_name": [r[6] for r in info["key_column_usage"]],
        "ordinal_position": pa.array([r[7] for r in info["key_column_usage"]], pa.int32()),
    })
    write(out, "info_columns", {
        "table_catalog": [r[0] for r in info["columns"]],
        "table_schema": [r[1] for r in info["columns"]],
        "table_name": [r[2] for r in info["columns"]],
        "column_name": [r[3] for r in info["columns"]],
        "data_type": [r[4] for r in info["columns"]],
    })

    for name, gen in (("cdc_test_decoding", fx.gen_test_decoding), ("cdc_wal2json", fx.gen_wal2json)):
        rows = gen()
        write(out, name, {
            "lsn": pa.array([r[0] for r in rows], pa.int64()),
            "data_size": pa.array([r[1] for r in rows], pa.int32()),
            "payload": pa.array([r[2] for r in rows], pa.string()),
        })

    arch, arch_truth = fx.gen_media_archives()
    write(out, "media_archives", {
        "path": pa.array([r[0] for r in arch], pa.string()),
        "content": pa.array([r[1] for r in arch], pa.binary()),
    })
    write(out, "media_archives_truth", {
        "path": pa.array([r[0] for r in arch_truth], pa.string()),
        "ordinal": pa.array([r[1] for r in arch_truth], pa.int32()),
        "member": pa.array([r[2] for r in arch_truth], pa.string()),
        "text": pa.array([r[3] for r in arch_truth], pa.string()),
    })

    pdfs, pdf_truth = fx.gen_media_pdfs()
    write(out, "media_pdfs", {
        "media_id": pa.array([r[0] for r in pdfs], pa.int64()),
        "content": pa.array([r[1] for r in pdfs], pa.binary()),
    })
    write(out, "media_pdfs_truth", {
        "media_id": pa.array([r[0] for r in pdf_truth], pa.int64()),
        "text": pa.array([r[1] for r in pdf_truth], pa.string()),
        "n_pages": pa.array([r[2] for r in pdf_truth], pa.int32()),
        "n_images": pa.array([r[3] for r in pdf_truth], pa.int32()),
        "img_mime": pa.array([r[4] for r in pdf_truth], pa.string()),
        "img_md5": pa.array([r[5] for r in pdf_truth], pa.string()),
    })

    cont, audio_truth, video_truth, image_truth = fx.gen_media_containers()
    write(out, "media_containers", {
        "media_id": pa.array([r[0] for r in cont], pa.int64()),
        "kind": pa.array([r[1] for r in cont], pa.string()),
        "content": pa.array([r[2] for r in cont], pa.binary()),
    })
    write(out, "media_containers_audio_truth", {
        "media_id": pa.array([r[0] for r in audio_truth], pa.int64()),
        "container": pa.array([r[1] for r in audio_truth], pa.string()),
        "sample_rate": pa.array([r[2] for r in audio_truth], pa.int32()),
        "n_channels": pa.array([r[3] for r in audio_truth], pa.int32()),
        "duration_ms": pa.array([r[4] for r in audio_truth], pa.float64()),
        "bitrate_kbps": pa.array([r[5] for r in audio_truth], pa.float64()),
        "vbr": pa.array([r[6] for r in audio_truth], pa.bool_()),
        "title": pa.array([r[7] for r in audio_truth], pa.string()),
        "artist": pa.array([r[8] for r in audio_truth], pa.string()),
        "pcm_md5": pa.array([r[9] for r in audio_truth], pa.string()),
    })
    write(out, "media_containers_video_truth", {
        "media_id": pa.array([r[0] for r in video_truth], pa.int64()),
        "n_frames": pa.array([r[1] for r in video_truth], pa.int32()),
        "width": pa.array([r[2] for r in video_truth], pa.int32()),
        "height": pa.array([r[3] for r in video_truth], pa.int32()),
        "fps": pa.array([r[4] for r in video_truth], pa.float64()),
        "duration_ms": pa.array([r[5] for r in video_truth], pa.float64()),
    })
    write(out, "media_containers_image_truth", {
        "media_id": pa.array([r[0] for r in image_truth], pa.int64()),
        "width": pa.array([r[1] for r in image_truth], pa.int32()),
        "height": pa.array([r[2] for r in image_truth], pa.int32()),
        "n_channels": pa.array([r[3] for r in image_truth], pa.int32()),
        "mean_luma": pa.array([r[4] for r in image_truth], pa.float64()),
    })

    media_curate, curate_truth = fx.gen_media_curate()
    write(out, "media_curate", {
        "media_id": pa.array([r[0] for r in media_curate], pa.int64()),
        "kind": pa.array([r[1] for r in media_curate], pa.string()),
        "content": pa.array([r[2] for r in media_curate], pa.binary()),
    })
    write(out, "media_curate_truth", {
        "media_id": pa.array([r[0] for r in curate_truth], pa.int64()),
        "kind": pa.array([r[1] for r in curate_truth], pa.string()),
        "fate": pa.array([r[2] for r in curate_truth], pa.string()),
    })

    av_rows, av_truth = fx.gen_av_match()
    write(out, "av_match", {
        "media_id": pa.array([r[0] for r in av_rows], pa.int64()),
        "kind": pa.array([r[1] for r in av_rows], pa.string()),
        "content": pa.array([r[2] for r in av_rows], pa.binary()),
    })
    write(out, "av_match_truth", {
        "part": pa.array([r[0] for r in av_truth], pa.string()),
        "a": pa.array([r[1] for r in av_truth], pa.int64()),
        "b": pa.array([r[2] for r in av_truth], pa.int64()),
        "c": pa.array([r[3] for r in av_truth], pa.int64()),
    })


if __name__ == "__main__":
    main()
