"""Interactive demo core: per-request inference + emotion-aware responses.

Capability parity with /root/reference/demo/gradio_demo.py:
``MultimodalEmotionDemo`` (per-request text/audio/video preprocessing with
stride-sampled frames, single-clip inference, per-modality breakdown under
late fusion, valence/arousal, conversation history),
``EmotionAwareResponseGenerator`` (emotion-keyed templates with a keyword
context slot and confidence-gated follow-ups), activity suggestions with
confidence-tiered phrasing, and the two charts (emotion distribution,
valence-arousal plane with fixed per-emotion anchors) emitted as plain data
dicts any frontend can render (the bundled stdlib web UI, or matplotlib).

TPU redesign: the model forward is one cached jitted executable; request
preprocessing reuses the framework's own decoders (no librosa/torchaudio).
"""
import random
import time
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from ..config import ModelConfig, config_from_dict, load_config_json
from ..data.audio_io import load_audio_fixed
from ..data.tokenizer import get_tokenizer
from ..data.video_io import load_video_frames
from ..models import MultimodalEmotionModel
from ..train.checkpoint import restore_checkpoint

EMOTION_COLORS = {
    "happy": "#FFD700", "sad": "#4169E1", "angry": "#DC143C",
    "fear": "#9932CC", "surprise": "#FF69B4", "disgust": "#228B22",
    "neutral": "#808080",
}

# Approximate anchor coordinates of each emotion in valence-arousal space
# (reference: gradio_demo.py:302-310).
VALENCE_AROUSAL_ANCHORS = {
    "happy": (0.8, 0.6), "surprise": (0.4, 0.8), "angry": (-0.6, 0.7),
    "fear": (-0.6, 0.8), "sad": (-0.7, -0.4), "disgust": (-0.6, 0.2),
    "neutral": (0.0, 0.0),
}

ACTIVITY_SUGGESTIONS = {
    "happy": [
        "🎉 Celebrate with the people around you!",
        "📸 Save this moment — a photo or a few journal lines",
        "🎵 Put on something upbeat and move a little",
        "🌟 Point this energy at a creative project",
        "💝 Pass the good mood along with a kind gesture",
    ],
    "sad": [
        "🤗 Check in with someone you trust",
        "📖 Pick up a comforting book or something uplifting to watch",
        "🚶 Take an easy walk outside",
        "🎨 Let the feeling out through writing or art",
        "☕ Make a warm drink and be gentle with yourself",
    ],
    "angry": [
        "🧘 Slow your breathing for a couple of minutes",
        "🏃 Burn the edge off with some exercise",
        "📝 Put the frustration into words on paper",
        "🎵 Queue up something calming",
        "💬 Tell someone you trust what set you off",
    ],
    "fear": [
        "🛡️ Name the parts of the situation you can control",
        "🧘 Ground yourself (try the 5-4-3-2-1 senses check)",
        "💪 Split the scary thing into small steps",
        "🤝 Lean on friends, family, or a professional",
        "📚 Learn more about what is driving the worry",
    ],
    "surprise": [
        "🤔 Give yourself a beat to take it in",
        "📝 Jot down your first reactions",
        "💬 Tell someone close what just happened",
        "🎯 Think through what changes because of it",
        "🌟 Treat the unexpected as room to grow",
    ],
    "disgust": [
        "🚿 Step away from whatever is unpleasant if you can",
        "🧘 Notice the feeling without judging it",
        "🌿 Reset with something cleansing — a shower, a tidy space",
        "💭 Ask what value this reaction is protecting",
        "🎯 Turn attention toward a positive alternative",
    ],
    "neutral": [
        "🎯 A calm moment — good time to set a goal",
        "📚 Learn something new or revisit a hobby",
        "🤝 Reach out to friends or family",
        "🌟 Try an activity you have not done before",
        "🧘 A few minutes of mindfulness never hurts",
    ],
}


class EmotionAwareResponseGenerator:
    """Template-based empathetic responses with a keyword context slot
    (reference: gradio_demo.py:435-536)."""

    RESPONSE_TEMPLATES = {
        "happy": [
            "That's great to hear — your happiness really shows. {context}",
            "I can feel the joy in this! {context}",
            "Your positive energy comes through clearly. {context}",
        ],
        "sad": [
            "It sounds like things are heavy right now. {context} It's okay to feel this way.",
            "I'm picking up some sadness here. {context} Your feelings are valid.",
            "That sounds hard. {context} I'm here to listen if you want to say more.",
        ],
        "angry": [
            "I can tell this is frustrating. {context} Anger is an understandable response.",
            "The frustration comes through. {context} Maybe we can work through it together.",
            "I hear how upset you are. {context} What might help right now?",
        ],
        "fear": [
            "There seems to be some worry in what you're sharing. {context} Feeling scared is natural.",
            "It sounds like this is making you anxious. {context} You're not alone in that.",
            "I sense some concern here. {context} Want to talk through what's worrying you?",
        ],
        "surprise": [
            "That sounds unexpected! {context} How are you taking it in?",
            "That must have caught you off guard. {context} Surprises can be a lot.",
            "Quite a turn of events! {context} What happens next?",
        ],
        "disgust": [
            "Something clearly isn't sitting right with you. {context} That reaction makes sense.",
            "That does sound unpleasant. {context} It's fair to feel put off.",
            "I can tell this bothers you. {context} Sometimes things just feel wrong.",
        ],
        "neutral": [
            "Thanks for sharing that. {context} How can I help today?",
            "Got it. {context} What would you like to look into next?",
            "Interesting. {context} What are your thoughts on it?",
        ],
    }

    CONTEXT_RULES = (
        (("work", "job", "boss", "colleague"),
         "Work situations can really shape how we feel."),
        (("family", "parent", "child", "sibling"),
         "Family relationships matter a lot to our wellbeing."),
        (("friend", "friendship"),
         "Friendships play a big role in our lives."),
        (("school", "study", "exam", "test"),
         "Academic pressure can be intense."),
    )

    FOLLOW_UPS = {
        "happy": "What's been the best part of your day?",
        "sad": "Is something specific weighing on you?",
        "angry": "What do you think would help you feel better?",
        "fear": "Would you like to talk about what's making you anxious?",
        "surprise": "How do you think this changes things for you?",
        "disgust": "What would help you move past this feeling?",
        "neutral": "What's on your mind today?",
    }

    def __init__(self, seed: Optional[int] = None):
        self._rng = random.Random(seed)

    def _context(self, user_input: str) -> str:
        words = set((user_input or "").lower().split())
        for keywords, context in self.CONTEXT_RULES:
            if words & set(keywords):
                return context
        return "Life has its ups and downs."

    def _follow_up(self, emotion: str, confidence: float) -> str:
        if confidence < 0.6:
            return ("I'm not fully sure I've read your emotional state right — "
                    "how are you really feeling?")
        return self.FOLLOW_UPS.get(emotion, "How can I support you better?")

    def generate_response(self, user_input: str, emotion: str,
                          confidence: float, emotion_analysis: Dict) -> str:
        templates = self.RESPONSE_TEMPLATES.get(
            emotion, self.RESPONSE_TEMPLATES["neutral"])
        template = self._rng.choice(templates)
        response = template.format(context=self._context(user_input))
        follow_up = self._follow_up(emotion, confidence)
        if follow_up:
            response += f" {follow_up}"
        return response


def activity_suggestions(emotion: str, confidence: float) -> str:
    """Confidence-tiered suggestion text (reference: gradio_demo.py:358-432)."""
    suggestions = ACTIVITY_SUGGESTIONS.get(emotion, ACTIVITY_SUGGESTIONS["neutral"])
    if confidence > 0.8:
        msg = f"I'm quite confident ({confidence:.1%}) that you're feeling {emotion}."
    elif confidence > 0.6:
        msg = f"I think ({confidence:.1%} confidence) you might be feeling {emotion}."
    else:
        msg = (f"I'm not entirely sure, but you might be feeling {emotion} "
               f"({confidence:.1%} confidence).")
    return msg + "\n\nHere are some suggestions:\n\n" + "\n".join(suggestions[:3])


class MultimodalEmotionDemo:
    """Loads a checkpoint and serves per-request emotion analysis
    (reference: gradio_demo.py:26-243)."""

    def __init__(self, model_path: str, config_path: Optional[str] = None,
                 config: Optional[ModelConfig] = None):
        if config is None:
            config = ModelConfig()
            if config_path:
                data = load_config_json(config_path)
                config = config_from_dict(ModelConfig,
                                          data.get("model_config", data))
        self.config = config
        payload = restore_checkpoint(model_path)
        self.params = payload["params"]
        if not config_path and payload.get("meta", {}).get("config"):
            self.config = config_from_dict(ModelConfig, payload["meta"]["config"])
        self.model = MultimodalEmotionModel(self.config)
        self.tokenizer = get_tokenizer(
            self.config.text_model_name, self.config.text_max_length,
            spm_path=getattr(self.config, "spm_model_path", None))
        self.emotion_colors = dict(EMOTION_COLORS)
        self.conversation_history: List[Dict] = []
        self.response_generator = EmotionAwareResponseGenerator()

        @jax.jit
        def _forward(params, text, audio, video):
            return self.model.apply(params, text, audio, video)

        self._forward = _forward

    # ------------------------------------------------------------ preprocess
    def _process_text(self, text: str) -> Dict[str, np.ndarray]:
        enc = self.tokenizer([text or ""])
        return {"input_ids": enc["input_ids"],
                "attention_mask": enc["attention_mask"]}

    def _process_audio(self, audio_file: Optional[str]) -> np.ndarray:
        if not audio_file:
            return np.zeros((1, self.config.audio_max_length), np.float32)
        wav = load_audio_fixed(audio_file, self.config.audio_sample_rate,
                               self.config.audio_max_length)
        return wav[None]

    def _process_video(self, video_file: Optional[str]) -> np.ndarray:
        size = tuple(self.config.video_frame_size)
        if not video_file:
            return np.zeros(
                (1, self.config.video_max_frames, size[1], size[0], 3), np.uint8)
        # stride-subsample long clips (reference: gradio_demo.py:213-214)
        import cv2

        try:
            cap = cv2.VideoCapture(str(video_file))
            total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) or 0
            cap.release()
        except Exception:
            total = 0
        stride = max(total // self.config.video_max_frames, 1) if total else 1
        frames = load_video_frames(video_file, self.config.video_max_frames,
                                   size, stride=stride)
        return frames[None]

    # -------------------------------------------------------------- inference
    def process_multimodal_input(
        self, text_input: str, audio_file: Optional[str] = None,
        video_file: Optional[str] = None, webcam_video: Optional[str] = None,
    ) -> Tuple[Dict, str, str, Dict, Dict]:
        try:
            video_source = webcam_video if webcam_video else video_file
            text = self._process_text(text_input)
            audio = self._process_audio(audio_file)
            video = self._process_video(video_source)

            outputs = jax.device_get(
                self._forward(self.params, text, audio, video))
            probs = np.asarray(outputs["emotion_probs"])[0]
            predicted = self.config.emotion_labels[int(np.argmax(probs))]
            confidence = float(np.max(probs))

            individual = {}
            if "individual_logits" in outputs:
                for modality, logits in outputs["individual_logits"].items():
                    p = np.asarray(jax.nn.softmax(logits, axis=-1))[0]
                    individual[modality] = {
                        "predicted_emotion":
                            self.config.emotion_labels[int(np.argmax(p))],
                        "confidence": float(np.max(p)),
                        "distribution": {
                            e: float(v) for e, v in
                            zip(self.config.emotion_labels, p)
                        },
                    }

            emotion_analysis = {
                "predicted_emotion": predicted,
                "confidence": confidence,
                "emotion_distribution": {
                    e: float(p) for e, p in
                    zip(self.config.emotion_labels, probs)
                },
                "individual_modalities": individual,
                "valence": float(np.asarray(outputs["valence"])[0, 0]),
                "arousal": float(np.asarray(outputs["arousal"])[0, 0]),
            }
            ai_response = self.response_generator.generate_response(
                text_input, predicted, confidence, emotion_analysis)
            suggestions = activity_suggestions(predicted, confidence)
            emotion_chart = self.emotion_chart_data(
                emotion_analysis["emotion_distribution"])
            va_chart = self.valence_arousal_chart_data(
                emotion_analysis["valence"], emotion_analysis["arousal"],
                predicted)
            self.conversation_history.append({
                "user_input": text_input,
                "emotion": predicted,
                "confidence": confidence,
                "ai_response": ai_response,
                "timestamp": time.strftime("%H:%M:%S"),
            })
            return emotion_analysis, ai_response, suggestions, emotion_chart, va_chart
        except Exception as e:
            return ({}, f"Error processing input: {e}",
                    "Please try again with valid inputs.", None, None)

    # ----------------------------------------------------------------- charts
    def emotion_chart_data(self, distribution: Dict[str, float]) -> Dict:
        return {
            "type": "bar",
            "title": "Emotion Distribution",
            "labels": list(distribution.keys()),
            "values": list(distribution.values()),
            "colors": [self.emotion_colors.get(e, "#808080")
                       for e in distribution],
        }

    def valence_arousal_chart_data(self, valence: float, arousal: float,
                                   emotion: str) -> Dict:
        return {
            "type": "scatter",
            "title": "Valence-Arousal Space",
            "anchors": {
                e: {"valence": v, "arousal": a,
                    "color": self.emotion_colors.get(e, "#808080")}
                for e, (v, a) in VALENCE_AROUSAL_ANCHORS.items()
            },
            "prediction": {"valence": valence, "arousal": arousal,
                           "emotion": emotion},
        }
