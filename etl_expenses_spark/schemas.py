"""Declared schemas (SURVEY.md §1.2-1.3, FIXTURES.md).

The engine's three gold tables mirror the reference's durable Redshift model:
- carrefour_data (`/root/reference/load_data/lambda_function.py:19-30`)
- mp_data (`/root/reference/load_data/lambda_function.py:78-110`)
- bank_payments (DDL at
  `/root/reference/extract_data_bank_pay/lambda_function.py:60-74`)

Deviations are documented: Redshift TIME → StringType 'HH:MM:SS'
(Spark has no TIME type), VARCHAR(n) → StringType (no length-param types).
"""

from __future__ import annotations

from pyspark.sql import types as T

CARREFOUR_DATA = T.StructType(
    [
        T.StructField("nro_ticket", T.LongType()),
        T.StructField("fecha", T.DateType()),
        T.StructField("categ", T.StringType()),
        T.StructField("prod", T.StringType()),
        T.StructField("cant", T.LongType()),
        T.StructField("peso", T.DoubleType()),
        T.StructField("p_unit", T.DoubleType()),
        T.StructField("p_total", T.DoubleType()),
        T.StructField("total_ticket_bruto", T.DoubleType()),
        T.StructField("total_ticket_meli", T.DoubleType()),
    ]
)

MP_DATA = T.StructType(
    [
        T.StructField("source_id", T.StringType()),
        T.StructField("report_id", T.StringType()),
        T.StructField("report_date", T.TimestampType()),
        T.StructField("settlement_date", T.TimestampType()),
        T.StructField("payment_method_type", T.StringType()),
        T.StructField("transaction_type", T.StringType()),
        T.StructField("transaction_amount", T.DoubleType()),
        T.StructField("transaction_date", T.TimestampType()),
        T.StructField("real_amount", T.DoubleType()),
        T.StructField("pos_id", T.StringType()),
        T.StructField("store_id", T.StringType()),
        T.StructField("store_name", T.StringType()),
        T.StructField("payer_name", T.StringType()),
        T.StructField("business_unit", T.StringType()),
        T.StructField("sub_unit", T.StringType()),
    ]
)

BANK_PAYMENTS = T.StructType(
    [
        T.StructField("id", T.StringType()),  # md5 natural key
        T.StructField("message_id", T.StringType()),
        T.StructField("fecha_pago", T.DateType()),
        T.StructField("hora_pago", T.StringType()),  # TIME → 'HH:MM:SS' string
        T.StructField("monto", T.DecimalType(12, 2)),
        T.StructField("divisa", T.StringType()),
        T.StructField("tarjeta", T.StringType()),
        T.StructField("nro_tarjeta", T.StringType()),
        T.StructField("comercio", T.StringType()),
        T.StructField("cuotas", T.LongType()),
        T.StructField("extraido_en", T.TimestampType()),
    ]
)

# Mail-document JSON layout (one doc per file,
# `/root/reference/extract_data_bank_pay/lambda_function.py:185-195`).
MAIL_DOC = T.StructType(
    [
        T.StructField("message_id", T.StringType()),
        T.StructField("date", T.StringType()),
        T.StructField("sender", T.StringType()),
        T.StructField("subject", T.StringType()),
        T.StructField("html_body", T.StringType()),
        T.StructField("raw_text", T.StringType()),
    ]
)

# MP settlement report: the two accepted header dialects
# (`/root/reference/load_data/lambda_function.py:95-151`). Column-alias map —
# data-driven normalization, not exception-driven control flow.
MP_HEADER_ALIASES: dict[str, str] = {
    # English dialect
    "SOURCE_ID": "source_id",
    "SETTLEMENT_DATE": "settlement_date",
    "PAYMENT_METHOD_TYPE": "payment_method_type",
    "TRANSACTION_TYPE": "transaction_type",
    "TRANSACTION_AMOUNT": "transaction_amount",
    "TRANSACTION_DATE": "transaction_date",
    "REAL_AMOUNT": "real_amount",
    "POS_ID": "pos_id",
    "STORE_ID": "store_id",
    "STORE_NAME": "store_name",
    "PAYER_NAME": "payer_name",
    "BUSINESS_UNIT": "business_unit",
    "SUB_UNIT": "sub_unit",
    # Spanish dialect
    "ID DE OPERACIÓN EN MERCADO PAGO": "source_id",
    "FECHA DE APROBACIÓN": "settlement_date",
    "TIPO DE MEDIO DE PAGO": "payment_method_type",
    "TIPO DE OPERACIÓN": "transaction_type",
    "VALOR DE LA COMPRA": "transaction_amount",
    "FECHA DE ORIGEN": "transaction_date",
    "MONTO NETO DE OPERACIÓN": "real_amount",
    "ID DE CAJA": "pos_id",
    "ID DE LA SUCURSAL": "store_id",
    "NOMBRE DE LA SUCURSAL": "store_name",
    "PAGADOR": "payer_name",
    "CANAL DE VENTA": "business_unit",
    "PLATAFORMA DE COBRO": "sub_unit",
}

# Ticket item-line categories
# (`/root/reference/transform_data_pdf/lambda_function.py:71`).
TICKET_CATEGORIES = (
    "Bebidas",
    "Carniceria",
    "Almacen",
    "Frutas Y Verduras",
    "Limpieza",
    "Perfumeria",
    "Hogar Bazar",
)
