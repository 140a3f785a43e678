"""Deploy: checkpoint -> packed serving artifact -> in-process smoke tests.

Parity: ``xfmr_rec/deploy.py:23-88`` — ``main(ckpt_path)`` prepares a
trainer (a fast-dev synthetic fit when no checkpoint is given, mirroring
``prepare_trainer`` fast_dev_run, reference trainer.py:477-498), exports
the artifact, then drives the composite Service in-process through the
ASGI test client: item and user round-trips and both recommend APIs
returning exactly ``top_k`` results (reference deploy.py:39-72).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import tempfile

from transformer_recommenders_tpu.configs import SeqDataModuleConfig, TrainConfig
from transformer_recommenders_tpu.data.module import SeqDataModule
from transformer_recommenders_tpu.params import TOP_K
from transformer_recommenders_tpu.serving.asgi import TestClient
from transformer_recommenders_tpu.serving.service import Service
from transformer_recommenders_tpu.training.trainer import Trainer


def _fast_dev_trainer(work_dir: str) -> Trainer:
    """No checkpoint: 1-batch synthetic fit (parity: fast_dev_run fallback,
    ``xfmr_rec/trainer.py:481-483``)."""
    data_config = SeqDataModuleConfig(
        data_dir=str(pathlib.Path(work_dir) / "data"),
        dataset="synthetic",
        embedder="hash",
        embedding_dim=64,
        max_seq_length=8,
        batch_size=8,
        synthetic_num_users=40,
        synthetic_num_items=60,
        synthetic_num_events=2000,
    )
    config = TrainConfig(
        hidden_size=64,
        num_hidden_layers=1,
        num_attention_heads=4,
        intermediate_size=64,
        max_seq_length=8,
        compute_dtype="float32",
        max_epochs=1,
        limit_train_batches=1,
        eval_batch_size=16,
        top_k=TOP_K,
        log_every_n_steps=1000,
        ckpt_dir=str(pathlib.Path(work_dir) / "ckpt"),
    )
    trainer = Trainer(
        config,
        SeqDataModule(data_config),
        log_dir=str(pathlib.Path(work_dir) / "logs"),
    )
    trainer.fit()
    return trainer


def _trainer_from_checkpoint(ckpt_path: str) -> Trainer:
    """Rebuild trainer + datamodule from the checkpoint's config sidecar
    (parity: ``load_args``, ``xfmr_rec/trainer.py:465-475``)."""
    ckpt = pathlib.Path(ckpt_path)
    config_file = ckpt.parent / "config.json"
    payload = json.loads(config_file.read_text())
    trainer = Trainer(
        TrainConfig.model_validate(payload["model"]),
        SeqDataModule(SeqDataModuleConfig.model_validate(payload["data"])),
        log_dir=str(ckpt.parent / "deploy_logs"),
    )
    trainer.restore(str(ckpt))
    return trainer


def test_service(service: Service, name: str, payload: dict):
    """POST one API through the in-process client (parity: ``test_bento``,
    ``xfmr_rec/deploy.py:23-36``)."""
    client = TestClient(service.to_asgi())
    response = client.post(name, payload)
    assert response.ok, f"{name}: {response.status_code} {response.json()}"
    return response.json()


def test_queries(service: Service) -> None:
    """Smoke assertions (parity: ``test_queries``, deploy.py:39-72)."""
    first_item_id = service.item_index.index.store.records["item_id"].iloc[0]
    first_user_id = service.user_index.index.store.records["user_id"].iloc[0]

    item = test_service(service, "item_id", {"item_id": str(first_item_id)})
    assert item["item_id"] == str(first_item_id), item
    assert item["item_text"]

    user = test_service(service, "user_id", {"user_id": str(first_user_id)})
    assert user["user_id"] == str(first_user_id), user

    recs = test_service(
        service, "recommend_with_item_id", {"item_id": str(first_item_id)}
    )
    assert len(recs) == TOP_K, f"expected {TOP_K} recs, got {len(recs)}"

    recs = test_service(
        service, "recommend_with_user_id", {"user_id": str(first_user_id)}
    )
    assert len(recs) == TOP_K, f"expected {TOP_K} recs, got {len(recs)}"

    # lexical search: query the first item's own text back out of the
    # BM25 index — its id must appear in the hits
    hits = test_service(
        service, "search_item_text", {"text": item["item_text"], "top_k": TOP_K}
    )
    assert any(h["item_id"] == str(first_item_id) for h in hits), hits

    name = test_service(service, "model_name", {})
    version = test_service(service, "model_version", {})
    assert isinstance(name, str) and isinstance(version, str)


def main(ckpt_path: str = "", artifact_dir: str = "") -> Service:
    with tempfile.TemporaryDirectory() as tmp:
        if ckpt_path:
            trainer = _trainer_from_checkpoint(ckpt_path)
        else:
            trainer = _fast_dev_trainer(tmp)
        artifact = pathlib.Path(artifact_dir or (pathlib.Path(tmp) / "artifact"))
        trainer.save(artifact)
        service = Service(artifact)
        test_queries(service)
        print(f"deploy OK: artifact={artifact}")
        return service


def cli_main() -> None:
    parser = argparse.ArgumentParser(prog="xrt-deploy")
    parser.add_argument("--ckpt_path", default="")
    parser.add_argument("--artifact_dir", default="")
    parser.add_argument("--serve", action="store_true", help="start the HTTP server")
    parser.add_argument("--port", type=int, default=3000)
    parser.add_argument(
        "--workers", type=int, default=1,
        help="SO_REUSEPORT worker processes (parity: BentoML workers)",
    )
    args = parser.parse_args()
    if args.workers > 1 and not args.artifact_dir:
        parser.error("--workers>1 needs --artifact_dir (workers load it)")
    service = main(args.ckpt_path, args.artifact_dir)
    if args.serve:
        from transformer_recommenders_tpu.serving.asgi import serve, serve_workers

        if args.workers > 1:
            # spawned CPU workers (fork-after-jax-init deadlocks; asgi.py);
            # drop the parent's fully loaded Service first — it would
            # otherwise pin an extra model+index copy in RAM for the whole
            # serving lifetime on exactly the hosts multiplying memory by
            # workers=cpu_count
            del service
            serve_workers(
                args.artifact_dir, port=args.port, workers=args.workers
            )
        else:
            serve(service.to_asgi(), port=args.port)


if __name__ == "__main__":
    cli_main()
