"""Per-format document serializers (markdown / doctags / html / text / etree).

Each serializer is a pure function `doc dict -> (text, spans)` designed to run
inside Arrow-batched UDFs; `spans` is the ordered, deduped
`(self_ref, label, text, media_ref)` sequence — the north-rule invariant
payload (parity: SerializationResult.spans, serializer/common.py:147-176).
"""
