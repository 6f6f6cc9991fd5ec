"""Fine-tune a cross-encoder reranker on (context, candidate, label) JSONL.

Capability parity with the reference's ``reranker/finetune.py:5-31``
(HF Trainer over bert-base on ``train.jsonl``); runs fully offline when
``--model`` points at a local checkpoint directory.

Usage:
    python -m ..reranker.finetune --data train.jsonl --model bert-base-uncased \
        --out ./reranker_model --epochs 2
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True, help="JSONL: context/candidate/label")
    ap.add_argument("--model", default="bert-base-uncased")
    ap.add_argument("--out", default="./reranker_model")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=2e-5)
    args = ap.parse_args()

    from transformers import (AutoModelForSequenceClassification,
                              AutoTokenizer, Trainer, TrainingArguments)
    import torch

    rows = [json.loads(l) for l in open(args.data) if l.strip()]
    tok = AutoTokenizer.from_pretrained(args.model)
    model = AutoModelForSequenceClassification.from_pretrained(
        args.model, num_labels=2)

    class Ds(torch.utils.data.Dataset):
        def __len__(self):
            return len(rows)

        def __getitem__(self, i):
            r = rows[i]
            enc = tok(r["context"], r["candidate"], truncation=True,
                      max_length=256, padding="max_length")
            enc["labels"] = int(r["label"])
            return {k: torch.tensor(v) for k, v in enc.items()}

    targs = TrainingArguments(
        output_dir=args.out, num_train_epochs=args.epochs,
        per_device_train_batch_size=args.batch_size,
        learning_rate=args.lr, logging_steps=10, save_strategy="no",
        report_to=[])
    Trainer(model=model, args=targs, train_dataset=Ds()).train()
    model.save_pretrained(args.out)
    tok.save_pretrained(args.out)
    print(f"saved reranker to {args.out}")


if __name__ == "__main__":
    main()
