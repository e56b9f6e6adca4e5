"""OpenAPI 3 schema for the serving API.

The reference exposes drf-spectacular's generated schema at /api/schema/
(+ swagger/redoc UIs, reference backend/project/urls.py:30-32); here the
schema is generated from the route table directly.
"""

from __future__ import annotations

_JOB_SCHEMA = {
    "type": "object",
    "properties": {
        "id": {"type": "string", "format": "uuid"},
        "vision_model": {"type": "integer"},
        "vision_model_details": {"$ref": "#/components/schemas/VisionModel"},
        "user_username": {"type": "string", "nullable": True},
        "status": {"type": "string",
                   "enum": ["PENDING", "PROCESSING", "DONE", "FAILED"]},
        "input_image": {"type": "string", "nullable": True},
        "mask_image": {"type": "string", "nullable": True},
        "error_message": {"type": "string"},
        "detections": {"type": "array", "items": {
            "type": "object",
            "properties": {"class_id": {"type": "integer"},
                           "box_yxyx": {"type": "array",
                                        "items": {"type": "integer"}}}}},
        "created_at": {"type": "string", "format": "date-time"},
        "updated_at": {"type": "string", "format": "date-time"},
    },
}

_MODEL_SCHEMA = {
    "type": "object",
    "properties": {
        "id": {"type": "integer"},
        "name": {"type": "string"},
        "description": {"type": "string"},
        "num_classes": {"type": "integer"},
        "input_size": {"type": "integer"},
        "config_name": {"type": "string"},
    },
}


def _paginated(ref: str) -> dict:
    return {"type": "object", "properties": {
        "count": {"type": "integer"},
        "next": {"type": "string", "nullable": True},
        "previous": {"type": "string", "nullable": True},
        "results": {"type": "array", "items": {"$ref": ref}},
    }}


def openapi_schema() -> dict:
    return {
        "openapi": "3.0.3",
        "info": {"title": "visiontransformer_tpu serving API",
                 "version": "1.0.0",
                 "description": "TPU-native structural-damage inference "
                                "platform (reference-compatible contract)"},
        "paths": {
            "/api/csrf/": {"get": {"summary": "Set CSRF cookie",
                                   "responses": {"200": {"description": "ok"}}}},
            "/api/hello/": {"get": {"summary": "Health check",
                                    "responses": {"200": {"description": "ok"}}}},
            "/api/vision-models/": {"get": {
                "summary": "List vision models",
                "responses": {"200": {"description": "paginated models"}}}},
            "/api/vision-models/{id}/": {"get": {
                "summary": "Model detail",
                "parameters": [{"name": "id", "in": "path", "required": True,
                                "schema": {"type": "integer"}}],
                "responses": {"200": {"description": "model"},
                              "404": {"description": "not found"}}}},
            "/api/inference-jobs/": {
                "get": {"summary": "List own jobs",
                        "parameters": [
                            {"name": "status", "in": "query",
                             "schema": {"type": "string"}},
                            {"name": "page", "in": "query",
                             "schema": {"type": "integer"}}],
                        "responses": {"200": {"description": "paginated jobs"},
                                      "403": {"description": "auth required"}}},
                "post": {"summary": "Submit inference job (multipart)",
                         "responses": {"201": {"description": "job created"},
                                       "400": {"description": "bad request"}}}},
            "/api/inference-jobs/{id}/": {"get": {
                "summary": "Job detail",
                "parameters": [{"name": "id", "in": "path", "required": True,
                                "schema": {"type": "string"}}],
                "responses": {"200": {"description": "job"},
                              "404": {"description": "not found"}}}},
            "/api/inference-jobs/{id}/complete/": {"post": {
                "summary": "External-worker completion callback (multipart "
                           "mask_image)",
                "responses": {"200": {"description": "job completed"},
                              "400": {"description": "already completed / "
                                                     "missing mask"}}}},
            "/api/metrics/": {"get": {
                "summary": "Platform counters",
                "responses": {"200": {"description": "counts"}}}},
            "/api/users/register/": {"post": {
                "summary": "Create account",
                "responses": {"201": {"description": "created"}}}},
            "/api/users/login/": {"post": {
                "summary": "Session login",
                "responses": {"200": {"description": "session cookie set"}}}},
            "/api/users/logout/": {"post": {
                "summary": "Destroy session",
                "responses": {"200": {"description": "logged out"}}}},
            "/api/users/current-user/": {"get": {
                "summary": "Authenticated user",
                "responses": {"200": {"description": "user"},
                              "403": {"description": "anonymous"}}}},
        },
        "components": {"schemas": {
            "InferenceJob": _JOB_SCHEMA,
            "VisionModel": _MODEL_SCHEMA,
            "PaginatedJobs": _paginated("#/components/schemas/InferenceJob"),
            "PaginatedModels": _paginated("#/components/schemas/VisionModel"),
        }},
    }
